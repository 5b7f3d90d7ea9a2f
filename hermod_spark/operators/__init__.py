from hermod_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    similarity,
    textops,
    transforms,
)
