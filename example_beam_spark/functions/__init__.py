from example_beam_spark.functions.scalar import (
    cosine_similarity,
    minhash_component,
    one_hot,
    salted_md5,
    shingle_array,
    token_array,
)

__all__ = [
    "cosine_similarity",
    "minhash_component",
    "one_hot",
    "salted_md5",
    "shingle_array",
    "token_array",
]
