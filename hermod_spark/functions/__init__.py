from hermod_spark.functions.topic import (  # noqa: F401
    topic_filter_to_regex,
    topic_matches,
    topic_matches_py,
)
from hermod_spark.functions import scalar, text  # noqa: F401
