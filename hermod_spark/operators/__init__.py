from hermod_spark.operators import (  # noqa: F401
    curation,
    dedup,
    joins,
    multimodal,
    relational,
    similarity,
    sketches,
    textops,
    transforms,
)
