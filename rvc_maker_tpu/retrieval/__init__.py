from .index import (  # noqa: F401
    FeatureIndex,
    build_index,
    kmeans,
    load_index,
    retrieval_blend,
    save_index,
)
