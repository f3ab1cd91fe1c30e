"""Chunk layer: page cutting, codec auto-selection, chunk container."""

from .chunk import ChunkMeta, decode_chunk, encode_chunk  # noqa: F401
from .columns import ColumnData, from_arrow, to_arrow  # noqa: F401
