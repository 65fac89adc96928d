from .manifest import Fragment, Manifest
from .catalog import Table
from .snapshot import Snapshot

IMAGE_SCHEMA = None  # set lazily in schema.py to avoid import cycles

from .schema import IMAGE_SCHEMA  # noqa: E402,F811
