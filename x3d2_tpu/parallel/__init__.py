from .topo import (DeviceMesh, field_spec, make_device_mesh,
                   make_sharded_step, shard_state, state_shardings)
