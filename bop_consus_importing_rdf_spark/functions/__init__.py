from .ntriples import (  # noqa: F401
    escape_literal,
    render_object,
    render_subject,
    nt_line,
    sql_escape_literal,
    sql_nt_line,
)
from .identify import identify, sql_identify  # noqa: F401
from .hashing import canonical_hash_agg, sql_canonical_hash_agg  # noqa: F401
