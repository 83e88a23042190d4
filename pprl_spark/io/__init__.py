"""Sources and sinks (reference §2.1 parity + the production table shape)."""

from .entities import (  # noqa: F401
    read_bit_vector_csv,
    read_entity_csv,
    read_pages,
    write_bit_vector_csv,
    write_match_csv,
)
from .warc import parse_warc_bytes, read_warc  # noqa: F401
