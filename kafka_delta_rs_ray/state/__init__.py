from .lineage import RunContext
