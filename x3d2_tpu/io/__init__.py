from .checkpoint import CheckpointManager
from .manager import IOManager
from .monitoring import Monitor, make_observables_fn
from .snapshot import SnapshotManager
from .stats import StatsManager
