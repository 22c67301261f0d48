"""Property-based tests for the pure-Python primitives (no Spark JVM):
SM4 cipher round-trip, XLSX round-trip, XXH64 reference values."""

from hypothesis import given, settings
from hypothesis import strategies as st

from polardbx_tools_spark.operators import sm4
from tools.pyxxh64 import xxh64

KEY = bytes.fromhex("0123456789abcdeffedcba9876543210")


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_sm4_ecb_roundtrip_any_bytes(data):
    ct = sm4.encrypt_ecb(data, KEY)
    assert len(ct) % 16 == 0 and len(ct) >= len(data)
    assert sm4.decrypt_ecb(ct, KEY) == data


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=100))
def test_sm4_text_roundtrip(s):
    ct = sm4.encrypt_ecb(s.encode("utf-8"), KEY)
    assert sm4.decrypt_ecb(ct, KEY).decode("utf-8") == s


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.booleans(),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                st.text(max_size=30),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_xlsx_roundtrip_any_table(rows):
    import os
    import tempfile

    from polardbx_tools_spark.xlsx import read_xlsx_rows, write_xlsx

    fd, path = tempfile.mkstemp(suffix=".xlsx")
    os.close(fd)
    try:
        write_xlsx(path, {"s": rows})
        got = read_xlsx_rows(path)
        width = max(len(r) for r in rows)
        want = [r + [None] * (width - len(r)) for r in rows]
        # numbers come back as float; bools as bool; strings as str
        norm = lambda v: float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v
        want = [[norm(v) for v in r] for r in want]
        assert got == want
    finally:
        os.unlink(path)


def test_xxh64_reference_vectors():
    """Published XXH64 test vectors (xxHash project): seed 0 / prime."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"", 2654435761) == 0xAC75FDA2929B17EF
