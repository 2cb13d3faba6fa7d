from nixiesearch_spark.query.ast import (  # noqa: F401
    BoolQuery,
    DisMaxQuery,
    KnnQuery,
    MatchAllQuery,
    MatchQuery,
    MultiMatchQuery,
    RRFQuery,
    SemanticQuery,
    parse_query,
)
from nixiesearch_spark.query.engine import Searcher  # noqa: F401
