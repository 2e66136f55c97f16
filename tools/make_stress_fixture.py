"""Build a K× scale-up derivative of a testdata sf dir for stress runs.

Scheme: K mutually-DECORRELATED replicas of the same shape, so true-match
density per row stays constant while volume scales — the honest way to
measure whether a plan has hidden quadratic terms (replicating identical
rows would grow the *answer* quadratically and drown the plan signal):

- orders/lineitem/part/customer/supplier: key-offset replicas (disjoint
  key spaces; joins land within a replica, AQE sees K× the partitions);
- documents: replica k > 0 suffixes every TOKEN with ``q{k}``, making the
  replica vocabularies disjoint — shingle/token/minhash blocking gets no
  cross-replica candidates, exactly like K independent corpora;
- embeddings: replica k cyclically shifts dimensions by 7k (mod dim), a
  norm-preserving decorrelation that keeps intra-replica geometry exact;
- events: replica k offsets user_id and event_id into disjoint key spaces
  (ts/value/props unchanged) — K independent user populations over the
  SAME time span, so per-user series shape (spine width, session counts,
  gap structure) stays constant while event volume scales, the honest
  growth input for the event-time operator family;
- nation/region: copied as-is (dims).

Output is written to /tmp (never to /root/testdata). Usage:
    python tools/make_stress_fixture.py /root/testdata/sf0.1 4 /tmp/stress_4x
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

OFFSETS = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
}
COPY = ("nation", "region")
EMB_SHIFT = 7


def main(src: str, k: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # key-offset tables: offset every key column by r * 10^ceil(log10(max+1))
    key_offsets: dict[str, int] = {}
    for t, keys in OFFSETS.items():
        mx = max(
            con.sql(
                f"SELECT MAX({c}) FROM '{src}/{t}.parquet'"
            ).fetchone()[0]
            for c in keys
        )
        off = 10 ** len(str(int(mx)))
        key_offsets[t] = off
    # o_custkey offsets must match c_custkey's, l_partkey part's, etc.
    shared = {
        "o_orderkey": key_offsets["orders"],
        "l_orderkey": key_offsets["orders"],
        "o_custkey": key_offsets["customer"],
        "c_custkey": key_offsets["customer"],
        "l_partkey": key_offsets["part"],
        "p_partkey": key_offsets["part"],
        "l_suppkey": key_offsets["supplier"],
        "s_suppkey": key_offsets["supplier"],
    }
    for t, keys in OFFSETS.items():
        parts = []
        for r in range(k):
            repl = ", ".join(
                f"{c} + {r * shared[c]} AS {c}" for c in keys
            )
            parts.append(
                f"SELECT * REPLACE ({repl}) FROM '{src}/{t}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )

    # documents: disjoint vocabulary per replica
    nd = con.sql(f"SELECT MAX(doc_id) FROM '{src}/documents.parquet'").fetchone()[0]
    d_off = 10 ** len(str(int(nd)))
    parts = [f"SELECT * FROM '{src}/documents.parquet'"]
    for r in range(1, k):
        parts.append(f"""
            SELECT doc_id + {r * d_off} AS doc_id,
                   array_to_string(list_transform(
                       string_split_regex(trim(text), '\\s+'),
                       tok -> tok || 'q{r}'), ' ') AS text,
                   lang, source,
                   CAST(length(array_to_string(list_transform(
                       string_split_regex(trim(text), '\\s+'),
                       tok -> tok || 'q{r}'), ' ')) AS BIGINT) AS n_chars
            FROM '{src}/documents.parquet'""")
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        f"(FORMAT PARQUET)"
    )

    # embeddings: cyclic dimension shift per replica (norm-preserving)
    dim = con.sql(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    nv = con.sql(f"SELECT MAX(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
    v_off = 10 ** len(str(int(nv)))
    parts = [f"SELECT * FROM '{src}/embeddings.parquet'"]
    for r in range(1, k):
        s = (EMB_SHIFT * r) % dim
        parts.append(f"""
            SELECT vec_id + {r * v_off} AS vec_id,
                   list_transform(generate_series(1, {dim}),
                       i -> embedding[((i - 1 + {s}) % {dim}) + 1]) AS embedding,
                   label
            FROM '{src}/embeddings.parquet'""")
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/embeddings.parquet' "
        f"(FORMAT PARQUET)"
    )

    # events: disjoint user/event key spaces per replica, time span shared.
    # user_id is a customer key (events->customer joins on user_id =
    # c_custkey), so it MUST use the customer offset — an independent
    # 10^digits(max user_id) offset can land replica users inside the BASE
    # customer range and silently cross replicas on that join (round-7
    # review catch; pinned in test_stress_fixture.py).
    ne = con.sql(f"SELECT MAX(event_id) FROM '{src}/events.parquet'").fetchone()[0]
    e_off = 10 ** len(str(int(ne)))
    u_off = key_offsets["customer"]
    parts = [f"SELECT * FROM '{src}/events.parquet'"]
    for r in range(1, k):
        parts.append(
            f"SELECT * REPLACE (event_id + {r * e_off} AS event_id, "
            f"user_id + {r * u_off} AS user_id) "
            f"FROM '{src}/events.parquet'"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/events.parquet' "
        f"(FORMAT PARQUET)"
    )

    for t in COPY:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    for t in list(OFFSETS) + ["documents", "embeddings", "events"]:
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
