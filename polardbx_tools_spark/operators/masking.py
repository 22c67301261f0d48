"""Masking / crypto column transforms at export time.

Reference parity (SURVEY.md §2.3 P6-P8):
* hiding mask — star out all but a shown tail
  (``batch-tool model/mask/HidingMasker.java:51-100``);
* hash mask — salted digest
  (``model/mask/HashMasker.java:51-58``, MD5+Base64 there; MD5-hex +
  SHA2 offered here);
* encryption — AES (``model/encrypt/AesCipher.java``) via Spark's
  builtin ``aes_encrypt``/``aes_decrypt``; SM4
  (``model/encrypt/Sm4Cipher.java:35-55``) via the pure-Python standard
  implementation in ``operators.sm4`` as Arrow-batched pandas UDFs;
* binary hex round-trip (``worker/util/ExportUtil.java:92-96``,
  ``ImportUtil.java:83-87``).

All pure column expressions — applied at the export projection exactly
like the reference applies maskers per field
(``worker/export/BaseExportWorker.java:203-207``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_hide(col: Column, show_tail: int = 4, mask_char: str = "*") -> Column:
    """Star out everything except the last ``show_tail`` characters."""
    n = F.length(col)
    return F.when(col.isNull(), F.lit(None).cast("string")).when(
        n <= show_tail, col
    ).otherwise(
        F.concat(
            F.repeat(F.lit(mask_char), (n - F.lit(show_tail)).cast("int")),
            F.substring(col, -show_tail, show_tail),
        )
    )


def mask_hash(col: Column, salt: str = "") -> Column:
    """Salted MD5 mask (hex). Reference emits Base64(MD5); hex keeps the
    same information hiding and ports to every SQL oracle."""
    return F.md5(F.concat(col.cast("string"), F.lit(salt)))


def mask_sha2(col: Column, salt: str = "", bits: int = 256) -> Column:
    return F.sha2(F.concat(col.cast("string"), F.lit(salt)), bits)


def mask_floor(col: Column, width: int = 10) -> Column:
    """FLOOR mask: round numerics down to a bucket boundary (declared but
    unimplemented in the reference's DataMaskerFactory — completed here)."""
    return (F.floor(col / width) * width).cast("double")


def to_hex(col: Column) -> Column:
    """Binary-safe export encoding (ref ``hex()`` on BINARY columns)."""
    return F.hex(col)


def from_hex(col: Column) -> Column:
    return F.unhex(col)


def caesar(col: Column, shift: int = 3) -> Column:
    """Toy Caesar cipher over a-z/A-Z (reference CaesarCipher.java:21 —
    kept for parity/testing, obviously not security) via translate."""
    import string

    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    src = lower + upper
    dst = (
        lower[shift % 26:] + lower[: shift % 26]
        + upper[shift % 26:] + upper[: shift % 26]
    )
    return F.translate(col, src, dst)


def sm4_encrypt(col: Column, key_hex: str) -> Column:
    """SM4-ECB/PKCS#7 column encryption (ref Sm4Cipher.java:35-55) as an
    Arrow-batched pandas UDF over the pure-Python cipher (operators.sm4,
    KAT-verified). Returns lowercase hex ciphertext. UDF is the right
    call here: there is no JVM SM4 builtin, and the cipher is pure CPU
    per value — Arrow batching keeps the transfer cost amortized."""
    from pyspark.sql.functions import pandas_udf

    key = bytes.fromhex(key_hex)

    @pandas_udf("string")
    def _enc(s):
        from polardbx_tools_spark.operators.sm4 import encrypt_ecb

        return s.map(
            lambda v: None if v is None else encrypt_ecb(v.encode("utf-8"), key).hex()
        )

    return _enc(col)


def sm4_decrypt(col: Column, key_hex: str) -> Column:
    from pyspark.sql.functions import pandas_udf

    key = bytes.fromhex(key_hex)

    @pandas_udf("string")
    def _dec(s):
        from polardbx_tools_spark.operators.sm4 import decrypt_ecb

        return s.map(
            lambda v: None if v is None
            else decrypt_ecb(bytes.fromhex(v), key).decode("utf-8")
        )

    return _dec(col)


def encrypt_aes(col: Column, key: str, mode: str = "GCM") -> Column:
    """AES encryption of a string column (ref AES-CBC cipher; Spark's
    builtin supports ECB/GCM/CBC). Key must be 16/24/32 bytes."""
    return F.aes_encrypt(col.cast("binary"), F.lit(key), F.lit(mode))


def decrypt_aes(col: Column, key: str, mode: str = "GCM") -> Column:
    return F.aes_decrypt(col, F.lit(key), F.lit(mode)).cast("string")


# --- PII detection / redaction -----------------------------------------
#
# Training-data curation needs a PII pass the reference never had
# (its maskers hide columns the OPERATOR names; a web corpus needs the
# engine to FIND the PII). Conservative, cross-engine-portable regexes:
# every pattern below parses identically under Java regex (Spark) and
# RE2 (DuckDB oracle) — no lookaround, no backreferences.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrence count of one PII kind (JVM-side regexp_count)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("long")


def pii_redact(
    col: Column, kinds: tuple[str, ...] | None = None, token: str = "[PII]"
) -> Column:
    """Replace every match of the selected PII kinds with ``token``.
    Kinds apply in the given order (phone/ssn before ipv4 matters when
    digit runs overlap); one chained regexp_replace projection, no
    Python in the hot path."""
    out = col
    for k in kinds or tuple(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[k], token)
    return out
