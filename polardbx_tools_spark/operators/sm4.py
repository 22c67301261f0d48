"""Pure-Python SM4 block cipher (GB/T 32907-2016, public standard).

Reference parity: ``batch-tool model/encrypt/Sm4Cipher.java:35-55`` uses
BouncyCastle's SM4 in ECB/PKCS5 for column encryption. No SM4 library
ships in this sandbox, so the published algorithm is implemented here
from the standard (S-box, FK/CK schedule, 32-round Feistel) and exposed
to Spark as Arrow-batched pandas UDFs in ``operators.masking``.
Verified against the standard's known-answer vector in
tests/test_operators.py.
"""

from __future__ import annotations

_SBOX = bytes.fromhex(
    "d690e9fecce13db716b614c228fb2c05"
    "2b679a762abe04c3aa44132649860699"
    "9c4250f491ef987a33540b43edcfac62"
    "e4b31ca9c908e89580df94fa758f3fa6"
    "4707a7fcf37317ba83593c19e6854fa8"
    "686b81b27164da8bf8eb0f4b70569d35"
    "1e240e5e6358d1a225227c3b01217887"
    "d40046579fd327524c3602e7a0c4c89e"
    "eabf8ad240c738b5a3f7f2cef96115a1"
    "e0ae5da49b341a55ad933230f58cb1e3"
    "1df6e22e8266ca60c02923ab0d534e6f"
    "d5db3745defd8e2f03ff6a726d6c5b51"
    "8d1baf92bbddbc7f11d95c411f105ad8"
    "0ac13188a5cd7bbd2d74d012b8e5b4b0"
    "8969974a0c96777e65b9f109c56ec684"
    "18f07dec3adc4d2079ee5f3ed7cb3948"
)

_FK = (0xA3B1BAC6, 0x56AA3350, 0x677D9197, 0xB27022DC)
_CK = tuple(
    sum((((4 * i + j) * 7) % 256) << (24 - 8 * j) for j in range(4))
    for i in range(32)
)
_M32 = 0xFFFFFFFF


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


def _tau(a: int) -> int:
    return (
        (_SBOX[(a >> 24) & 0xFF] << 24)
        | (_SBOX[(a >> 16) & 0xFF] << 16)
        | (_SBOX[(a >> 8) & 0xFF] << 8)
        | _SBOX[a & 0xFF]
    )


def _t_enc(a: int) -> int:
    b = _tau(a)
    return b ^ _rotl(b, 2) ^ _rotl(b, 10) ^ _rotl(b, 18) ^ _rotl(b, 24)


def _t_key(a: int) -> int:
    b = _tau(a)
    return b ^ _rotl(b, 13) ^ _rotl(b, 23)


def key_schedule(key: bytes) -> list[int]:
    if len(key) != 16:
        raise ValueError("SM4 key must be 16 bytes")
    k = [int.from_bytes(key[i * 4:i * 4 + 4], "big") ^ _FK[i] for i in range(4)]
    rk = []
    for i in range(32):
        k.append(k[i] ^ _t_key(k[i + 1] ^ k[i + 2] ^ k[i + 3] ^ _CK[i]))
        rk.append(k[i + 4])
    return rk


def _crypt_block(block: bytes, rk: list[int]) -> bytes:
    x = [int.from_bytes(block[i:i + 4], "big") for i in range(0, 16, 4)]
    for i in range(32):
        x.append(x[i] ^ _t_enc(x[i + 1] ^ x[i + 2] ^ x[i + 3] ^ rk[i]))
    return b"".join(x[35 - i].to_bytes(4, "big") for i in range(4))


def encrypt_block(block: bytes, key: bytes) -> bytes:
    return _crypt_block(block, key_schedule(key))


def decrypt_block(block: bytes, key: bytes) -> bytes:
    return _crypt_block(block, list(reversed(key_schedule(key))))


def _pad(data: bytes) -> bytes:
    n = 16 - (len(data) % 16)
    return data + bytes([n]) * n


def _unpad(data: bytes) -> bytes:
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("bad PKCS#7 padding")
    return data[:-n]


def encrypt_ecb(data: bytes, key: bytes) -> bytes:
    """SM4-ECB with PKCS#7 padding (the reference's ECB/PKCS5Padding
    mode, Sm4Cipher.java:41)."""
    rk = key_schedule(key)
    padded = _pad(data)
    return b"".join(
        _crypt_block(padded[i:i + 16], rk) for i in range(0, len(padded), 16)
    )


def decrypt_ecb(data: bytes, key: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("ciphertext not a multiple of the block size")
    rk = list(reversed(key_schedule(key)))
    return _unpad(
        b"".join(_crypt_block(data[i:i + 16], rk) for i in range(0, len(data), 16))
    )
