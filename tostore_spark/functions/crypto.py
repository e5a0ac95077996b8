"""Value-level encryption helpers (the reference's ToCrypto surface).

Reference: value-level encryption utilities (README.md "Value-Level
Encryption (ToCrypto)"; the engine also supports at-rest encryption config).

Spark-first: column encryption uses the built-in ``aes_encrypt`` /
``aes_decrypt`` expressions (JVM-side, GCM by default) — encrypt before
write, decrypt on read, no Python in the path.  Deterministic mode (ECB) is
offered for columns that must remain join/group-able while encrypted, with
the usual caveat that determinism leaks equality.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _key_col(key: str) -> Column:
    # normalize any passphrase to a 32-byte AES-256 key
    return F.lit(hashlib.sha256(key.encode()).digest())


def encrypt_column(col: Column, key: str, deterministic: bool = False) -> Column:
    """Encrypt a string/binary column; returns base64 text."""
    mode = "ECB" if deterministic else "GCM"
    return F.base64(F.aes_encrypt(col.cast("string"), _key_col(key), F.lit(mode)))


def decrypt_column(col: Column, key: str, deterministic: bool = False) -> Column:
    """Decrypt a base64 column produced by encrypt_column; returns string."""
    mode = "ECB" if deterministic else "GCM"
    return F.aes_decrypt(F.unbase64(col), _key_col(key), F.lit(mode)).cast("string")
