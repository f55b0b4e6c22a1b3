"""Data sources: the engine's scan surface.

The reference's only source is a sorted directory of line-oriented
text files (reference: mapreduce/manager/__main__.py:93-95). We keep
that (``text.read_text_dir``) and add the columnar scans a real engine
needs (``catalog`` for the parquet star schema, plus csv/json).
"""

from .catalog import TABLES, load_table, load_tables, register_views  # noqa: F401
from .formats import read_csv, read_json  # noqa: F401
from .rrtext import RoundRobinTextDataSource  # noqa: F401
from .tailtext import TailTextDataSource  # noqa: F401
from .txnfeed import TxnFeedDataSource  # noqa: F401
from .text import read_text_dir  # noqa: F401
