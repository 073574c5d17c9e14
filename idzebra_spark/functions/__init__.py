from idzebra_spark.functions.tokenizer import (
    TOKEN_SPLIT_RE,
    tokenize,
    tokenize_array,
    doc_lengths,
)
from idzebra_spark.functions.codec import (
    varint_encode,
    varint_decode,
    delta_varint_encode,
    delta_varint_decode,
)

__all__ = [
    "TOKEN_SPLIT_RE",
    "tokenize",
    "tokenize_array",
    "doc_lengths",
    "varint_encode",
    "varint_decode",
    "delta_varint_encode",
    "delta_varint_decode",
]
