"""Named query registry — package facade.

The monolithic queries.py (18k LoC, 339 functions) is split into family
modules; importing them here runs the @query decorators, so QUERIES/ORACLE
are fully populated after `import ...queries`, exactly as before.  The
parity rules from the original module docstring live in `_common.py`.
"""

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401
    _BUCKETED_SEQ,
    _CORRM_COLS,
    _COS_EXPR,
    _DUP_UNION,
    _GEO_PENTAGON,
    _GEO_PX,
    _GEO_PY,
    _PII_EMAIL_RE,
    _PII_IP_RE,
    _SCRIPT_AR,
    _SCRIPT_CYR,
    _SCRIPT_HAN,
    _STREAM_EXEC_SEQ,
    _STREAM_DIRS,
    _corrm_oracle,
    _dec,
    _dsum,
    _events_stream,
    _geo,
    _lang_case_sql,
    _run_stream,
    _t,
    ORACLE,
    QUERIES,
    query,
)
from . import core  # noqa: F401,E402
from . import streaming_sources  # noqa: F401,E402
from . import sql_surface  # noqa: F401,E402
from . import series_text  # noqa: F401,E402
from . import sketches_arrays  # noqa: F401,E402
from . import product_analytics  # noqa: F401,E402
from . import state_media  # noqa: F401,E402
from . import clustering  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402


def all_queries():
    return dict(QUERIES)


def all_oracle_sql():
    return dict(ORACLE)
