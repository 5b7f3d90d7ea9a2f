from hermod_spark.operators import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    relational,
    similarity,
    sketches,
    textops,
    transforms,
)
