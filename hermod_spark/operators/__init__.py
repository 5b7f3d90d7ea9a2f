from hermod_spark.operators import (  # noqa: F401
    curation,
    dedup,
    graph,
    joins,
    layout,
    multimodal,
    relational,
    similarity,
    sketches,
    textindex,
    textops,
    transforms,
)
