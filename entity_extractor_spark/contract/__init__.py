"""Driver-contract package: every SURVEY.md SS2 operator demonstrated over
the driver-provided tables (/root/testdata/sf*/), each paired with an
ANSI-SQL oracle DuckDB runs on the same parquet (CORRECTNESS_r{N}.json
gate). Formerly one 11k-line contract.py; split by domain in round 4
(VERDICT ask #6) with `Q`/`SQL` still the aggregating dicts.

Registration order across modules is fixed by the import order below;
the driver-facing ordering (never-driver-checked queries first) is
applied dynamically in __spark_entry__.queries() from CORRECTNESS_r*.json,
which supersedes the old hardcoded _reorder_for_driver list.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import Q, SQL, query  # noqa: F401

# domain modules register their queries on import, in this order
from . import relational  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import ann  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import rag  # noqa: E402,F401
from . import kg  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import curate  # noqa: E402,F401
from . import stream  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import er  # noqa: E402,F401
from . import stats  # noqa: E402,F401
from . import audit  # noqa: E402,F401
