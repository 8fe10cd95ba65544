"""XXH64 (Spark's ``xxhash64``, seed 42) as generated DuckDB SQL.

Why this exists: the MinHash-LSH dedup operators hash shingles and band
signatures with Catalyst's ``xxhash64`` (operators/dedup.py) — the fast JVM
path an engine should use. That made their driver-contract entries rows-only
("not SQL-expressible"). But XXH64 is a pure function of bytes, and DuckDB
has 128-bit integers, xor, and list lambdas — so the WHOLE algorithm
(stripes, word/int/byte tails, avalanche) can be emitted as a single SQL
expression, giving the LSH dedup pipeline a real end-to-end DuckDB oracle.

Implementation notes:

* All arithmetic is HUGEINT (signed 128-bit) mod 2^64. A raw 64×64-bit
  product can exceed 2^127, so :func:`_mulmod` splits the multiplicand into
  32-bit halves (the multiplier is always one of the five XXH primes, baked
  as constant halves): ``a*b mod 2^64 = ((ah*bl + al*bh) mod 2^32)*2^32
  + al*bl (mod 2^64)`` — every intermediate stays under 2^65.
* Every compound operand is LET-BOUND through a single-element
  ``list_transform`` (:func:`stage`) with a fresh variable name. Without
  this the expression tree duplicates operands multiplicatively (rotl uses
  x twice, mulmod three times) — the naive emission was 155 KB and ~1 ms
  per hash; the staged form is ~10 KB and ~70 µs (measured on 100k rows).
* Byte extraction UTF-8-encodes each character's codepoint arithmetically
  (:func:`str_to_bytes_sql`) — exact for ANY Unicode input, not just ASCII;
  pinned bit-exact against Catalyst on Latin-1/CJK/emoji strings in tests.
* Verified bit-exact against ``F.xxhash64`` for empty/short/word/int/byte
  tails, 32-byte+ stripes, and multi-argument chaining
  (tests/test_textops.py).

Spark reference semantics (catalyst XXH64): seed 42; multi-argument calls
chain, with the running hash as the next argument's seed; long args use
``hashLong`` (one 8-byte word), int args ``hashInt`` (one 4-byte word).
"""

from __future__ import annotations

import itertools

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
TWO64 = 1 << 64
TWO32 = 1 << 32
SEED = 42

_fresh_ids = itertools.count()


def stage(expr: str, var: str, body: str) -> str:
    """let-binding via a single-element list lambda: ``body`` may reference
    ``var`` many times while ``expr`` is evaluated exactly once."""
    return f"list_transform([{expr}], {var} -> {body})[1]"


def _fresh(prefix: str) -> str:
    return f"{prefix}{next(_fresh_ids)}"


def _mulmod(a: str, b: int) -> str:
    """``(a * b) mod 2^64`` for HUGEINT expression ``a`` (< 2^64) and a
    constant ``b`` (< 2^64), without overflowing the signed 128-bit range."""
    bh, bl = b >> 32, b & (TWO32 - 1)
    v = _fresh("m")
    body = (
        f"((({v} // {TWO32}) * {bl} + ({v} % {TWO32}) * {bh}) % {TWO32})"
        f" * {TWO32} + ({v} % {TWO32}) * {bl}"
    )
    return stage(f"({a})::HUGEINT", v, f"({body}) % {TWO64}::HUGEINT")


def _rotl(x: str, r: int) -> str:
    """64-bit rotate-left of HUGEINT expression ``x`` (< 2^64)."""
    v = _fresh("r")
    return stage(
        x, v, f"(({v}) * {1 << r} + ({v}) // {1 << (64 - r)}) % {TWO64}::HUGEINT"
    )


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT"


def _fmix(h: str) -> str:
    """XXH64 avalanche, staged (each intermediate bound once)."""
    out = h
    for body in (
        _xor("x", f"x // {1 << 33}"),
        _mulmod("x", P2),
        _xor("x", f"x // {1 << 29}"),
        _mulmod("x", P3),
        _xor("x", f"x // {1 << 32}"),
    ):
        out = stage(out, "x", body)
    return out


def _word_round(h: str, k: str) -> str:
    """h = rotl(h ^ (rotl(k*P2,31)*P1), 27) * P1 + P4  (8-byte word)."""
    k1 = _mulmod(_rotl(_mulmod(k, P2), 31), P1)
    return f"({_mulmod(_rotl(_xor(h, k1), 27), P1)} + {P4}) % {TWO64}::HUGEINT"


def _le_word(bts: str, start: str, nbytes: int) -> str:
    """Little-endian integer from ``nbytes`` bytes of byte-list expression
    ``bts`` beginning at 1-based position expression ``start``."""
    terms = " + ".join(
        f"({bts})[({start}) + {j}]::HUGEINT * {1 << (8 * j)}"
        for j in range(nbytes)
    )
    return f"({terms})"


def xxh64_bytes_sql(bts: str, seed: str = str(SEED)) -> str:
    """DuckDB expression: XXH64 of the byte-list expression ``bts`` (a
    ``list`` of 0..255 ints) with HUGEINT ``seed`` expression. Result is the
    UNSIGNED hash in [0, 2^64) as HUGEINT — see :func:`to_signed_sql`.

    Stripe accumulators (n >= 32) are four independent ``list_reduce`` folds
    over lane words (staged so each fold runs once); the word/int/byte tails
    are further folds; everything else is the straight-line XXH64 spec.
    """
    n = f"length({bts})"
    v_init = [
        f"((({seed}) + {P1} + {P2}) % {TWO64}::HUGEINT)",
        f"((({seed}) + {P2}) % {TWO64}::HUGEINT)",
        f"(({seed})::HUGEINT)",
        f"((({seed}) - {P1} + {TWO64}::HUGEINT) % {TWO64}::HUGEINT)",
    ]

    def v_fold(j: int) -> str:
        lane = _le_word(bts, f"32 * t + {8 * j} + 1", 8)
        lanes = f"[{lane} FOR t IN generate_series(0, ({n}) // 32 - 1)]"
        body = _mulmod(
            _rotl(f"(acc + {_mulmod('w', P2)}) % {TWO64}::HUGEINT", 31), P1
        )
        return f"list_reduce([{v_init[j]}] || {lanes}, (acc, w) -> {body})"

    merge_body = (
        f"({_mulmod(_xor('acc', _mulmod(_rotl(_mulmod('v', P2), 31), P1)), P1)}"
        f" + {P4}) % {TWO64}::HUGEINT"
    )
    v1, v2, v3, v4 = (_fresh("v") for _ in range(4))
    stripes = (
        f"list_reduce([({_rotl(v1, 1)} + {_rotl(v2, 7)} + {_rotl(v3, 12)}"
        f" + {_rotl(v4, 18)}) % {TWO64}::HUGEINT]"
        f" || [{v1}, {v2}, {v3}, {v4}], (acc, v) -> {merge_body})"
    )
    for var, fold in ((v4, v_fold(3)), (v3, v_fold(2)), (v2, v_fold(1)), (v1, v_fold(0))):
        stripes = stage(fold, var, stripes)
    h0 = (
        f"(CASE WHEN ({n}) >= 32 THEN {stripes}"
        f" ELSE (({seed}) + {P5}) % {TWO64}::HUGEINT END + ({n}))"
        f" % {TWO64}::HUGEINT"
    )
    # ---- word tail: 8-byte words from stripe end to (n//8)*8
    words = (
        f"[{_le_word(bts, f'({n}) // 32 * 32 + 8 * t + 1', 8)}"
        f" FOR t IN generate_series(0, (({n}) // 8 * 8 - ({n}) // 32 * 32) // 8 - 1)]"
    )
    h_words = f"list_reduce([{h0}] || {words}, (acc, w) -> {_word_round('acc', 'w')})"
    # ---- int tail: 4 bytes at (n//8)*8 when n%8 >= 4 (fold over a 0/1-elem list)
    le32 = _le_word(bts, f"({n}) // 8 * 8 + 1", 4)
    int_body = (
        f"({_mulmod(_rotl(_xor('acc', _mulmod(le32, P1)), 23), P2)} + {P3})"
        f" % {TWO64}::HUGEINT"
    )
    h_int = (
        f"list_reduce([{h_words}] ||"
        f" [0::HUGEINT FOR _z IN generate_series(1,"
        f" CASE WHEN ({n}) % 8 >= 4 THEN 1 ELSE 0 END)],"
        f" (acc, _w) -> {int_body})"
    )
    # ---- byte tail
    byte_body = _mulmod(_rotl(_xor("acc", _mulmod("b", P5)), 11), P1)
    tail_bytes = (
        f"[({bts})[t]::HUGEINT FOR t IN generate_series("
        f"({n}) // 8 * 8 + CASE WHEN ({n}) % 8 >= 4 THEN 4 ELSE 0 END + 1, ({n}))]"
    )
    h_bytes = f"list_reduce([{h_int}] || {tail_bytes}, (acc, b) -> {byte_body})"
    return _fmix(h_bytes)


def str_to_bytes_sql(s: str) -> str:
    """VARCHAR expression -> UTF-8 byte list, exact for ANY Unicode input.

    Each character's codepoint is UTF-8-encoded arithmetically (1-4 bytes
    by the standard leading-byte/continuation-byte construction) and the
    per-character lists are flattened. For ASCII this degenerates to the
    old ``unicode(char)`` form; for multi-byte characters it now matches
    what Spark hashes (the UTF-8 encoding), closing the documented
    ASCII-only oracle asterisk — pinned bit-exact on Latin-1/CJK/emoji in
    tests/test_textops.py."""
    cp = _fresh("cp")
    enc = (
        f"CASE WHEN {cp} < 128 THEN [{cp}]"
        f" WHEN {cp} < 2048 THEN [192 + {cp} // 64, 128 + {cp} % 64]"
        f" WHEN {cp} < 65536 THEN [224 + {cp} // 4096,"
        f" 128 + ({cp} // 64) % 64, 128 + {cp} % 64]"
        f" ELSE [240 + {cp} // 262144, 128 + ({cp} // 4096) % 64,"
        f" 128 + ({cp} // 64) % 64, 128 + {cp} % 64] END"
    )
    per_char = stage(f"unicode(({s})[i])", cp, enc)
    return f"flatten([{per_char} FOR i IN generate_series(1, length({s}))])"


def xxh64_str_sql(s: str, seed: str = str(SEED)) -> str:
    """XXH64 of a VARCHAR expression (any Unicode), unsigned HUGEINT result."""
    return stage(str_to_bytes_sql(s), _bind := _fresh("bts"), xxh64_bytes_sql(_bind, seed))


def hash_long_sql(v: str, seed: str) -> str:
    """Spark XXH64.hashLong: the long is one 8-byte little-endian word.
    ``v`` must be a non-negative HUGEINT expression < 2^64 (cast signed
    longs with ``(x + 2^64) % 2^64`` first)."""
    h0 = f"(({seed}) + {P5} + 8) % {TWO64}::HUGEINT"
    k1 = _mulmod(_rotl(_mulmod(f"({v})", P2), 31), P1)
    h = f"({_mulmod(_rotl(_xor(h0, k1), 27), P1)} + {P4}) % {TWO64}::HUGEINT"
    return _fmix(h)


def hash_int_sql(v: str, seed: str) -> str:
    """Spark XXH64.hashInt (IntegerType args, e.g. ``F.lit(band)``): the int
    is widened unsigned to 32 bits. ``v`` must be a non-negative expression
    < 2^32."""
    h0 = f"(({seed}) + {P5} + 4) % {TWO64}::HUGEINT"
    h = (
        f"({_mulmod(_rotl(_xor(h0, _mulmod(f'({v})', P1)), 23), P2)} + {P3})"
        f" % {TWO64}::HUGEINT"
    )
    return _fmix(h)


def to_signed_sql(h: str) -> str:
    """[0, 2^64) HUGEINT -> Spark's signed BIGINT representation."""
    v = _fresh("s")
    return stage(
        h,
        v,
        f"CASE WHEN {v} >= {1 << 63}::HUGEINT"
        f" THEN ({v} - {TWO64}::HUGEINT)::BIGINT ELSE {v}::BIGINT END",
    )
