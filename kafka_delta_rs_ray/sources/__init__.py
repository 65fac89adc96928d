from .readers import read_changeset, read_snapshot
