from connapse_spark.functions.vector import (  # noqa: F401
    cosine_expr,
    dot_expr,
    l2norm_expr,
    to_double_array,
)
from connapse_spark.functions.text import (  # noqa: F401
    tokens_exact_expr,
    tokens_stemmed_expr,
    stem_expr,
)
from connapse_spark.functions.embed import embed_expr, embed_py  # noqa: F401
