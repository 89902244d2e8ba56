from .snapshot_table import SnapshotTable  # noqa: F401
