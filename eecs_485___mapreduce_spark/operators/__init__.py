"""Named operators: the reference's two programs over raw text
directories (wordcount, grep), plus the exec-compat pipe layer that
reproduces the reference's defining feature — arbitrary streaming
executables as map/reduce operators.
"""

from .grep import grep_text_dir  # noqa: F401
from .pipe import md5_partition, pipe_map, pipe_reduce  # noqa: F401
from .wordcount import wordcount_text_dir  # noqa: F401
