#!/usr/bin/env python3
"""Build the q223 DEFLATE fixture (driver-side tooling, not library code).

DEFLATE is not SQL-expressible, so q223's oracle reads a precomputed
fixture instead: for every DISTINCT document text across the test
corpora, the raw-deflate (wbits=-15, level 6, default strategy) length
via CPython's zlib — an implementation path independent of the JVM
Deflater the operator uses (both bind zlib's algorithm; agreement on
LENGTH at fixed level/strategy/window is the determinism the op pins).
Keyed by md5(text) so one fixture serves every SF: the oracle joins
documents on md5(text) and never needs to know doc_ids or the SF.

Usage: python3 tools/gen_q223_fixture.py <out.parquet> <sfDir>...
"""
import hashlib, sys, zlib
import duckdb


def deflate_len(b: bytes) -> int:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    return len(c.compress(b)) + len(c.flush())


def main(out, dirs):
    seen = {}
    for d in dirs:
        for (text,) in duckdb.query(
                f"SELECT DISTINCT text FROM '{d}/documents.parquet'").fetchall():
            b = text.encode("utf-8")
            h = hashlib.md5(b).hexdigest()
            if h not in seen:
                seen[h] = (len(b), deflate_len(b))
    con = duckdb.connect()
    con.execute("CREATE TABLE f (h VARCHAR, n_bytes BIGINT, deflate_len BIGINT)")
    con.executemany("INSERT INTO f VALUES (?, ?, ?)",
                    [(h, nb, dl) for h, (nb, dl) in seen.items()])
    con.execute(f"COPY (SELECT * FROM f ORDER BY h) TO '{out}' (FORMAT PARQUET)")
    print(f"{len(seen)} distinct texts -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
