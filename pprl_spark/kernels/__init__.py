"""Pure numpy/stdlib kernels — usable without Spark.

These are the bit-exact re-implementations of the reference's core
semantics (ul-mds/pprl, /root/reference).  The Spark layer wraps them in
Arrow-batched pandas UDFs; the reference's unit-test goldens run directly
against this package (see tests/test_kernel_*).
"""

from . import bits, encode, harden, hashing, phonetics, similarity, tokenize, transform, translit  # noqa: F401
