"""Named query registry — package facade.

The monolithic queries.py (18k LoC, 339 functions) is split into family
modules; importing them here runs the @query decorators, so QUERIES/ORACLE
are fully populated after `import ...queries`, exactly as before.  The
parity rules from the original module docstring live in `_common.py`.
"""

from ._common import *  # noqa: F401,F403
from ._common import ORACLE, QUERIES, query  # noqa: F401
from . import core  # noqa: F401,E402
from . import streaming_sources  # noqa: F401,E402
from . import sql_surface  # noqa: F401,E402
from . import series_text  # noqa: F401,E402
from . import sketches_arrays  # noqa: F401,E402
from . import product_analytics  # noqa: F401,E402
from . import state_media  # noqa: F401,E402


def all_queries():
    return dict(QUERIES)


def all_oracle_sql():
    return dict(ORACLE)
