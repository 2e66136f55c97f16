"""Multi-seed random-warehouse sweep over the relational oracle surface.

Companion to tools/fuzz_seeds_probe.py for the non-documents surface.
tests/test_fuzz_parity_relational.py pins ONE hand-curated adversarial
micro-warehouse (one row per known hazard class). This probe sweeps
MANY seeds, each generating a referentially-consistent random warehouse
that COMPOSES those hazard classes — boundary-rich prices (x.005 cents
boundaries, zeros, negatives, ties), special dates (leap days, month
ends, max-date anchor ties), childless parents (regions without
nations, customers without orders, orders without lineitems, parts
never ordered), per-user event chains drawn from hazard patterns
(identical timestamps, exact 30 m session-gap chains, hour-boundary
rows, constant-value hours, degenerate JSON props), float32-exact
embedding grids with zero/duplicate/negated/denormal/constant vectors,
and a random document corpus. Random composition explores interactions
the one-per-class fixture cannot.

Each seed: build warehouse -> run every relational oracle-backed query
Spark-vs-DuckDB on it (the grading driver's sorted-stringified-row
compare; same name filter, SKIP_PREFIXES and CONTRACT_EXCLUDED as the
pinned test) -> report per-seed. Any mismatch is a real cross-engine
divergence to fix or pin; exit 1.

Usage:
    python tools/fuzz_rel_seeds_probe.py [--seeds N] [--start S]
                                         [--skip-streaming]

Default: 8 seeds from 200. Deterministic per seed (stdlib Random).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta

# Boundary-rich pools (the curated fixture's hazard values, drawn at
# random). MONEY columns are CENT-GRAIN by ingest contract (measured on
# every shipped fixture; pinned in test_tenth_cent_money_is_out_of_
# contract after this probe's seed 200 showed tenth-cent totalprice
# putting ROUND(agg, 2) on the .005 boundary where the engines round
# apart). events.value is the documented tenth-cent exception — its
# surfaces are integer-cents formulations.
PRICE_POOL = [0.0, 0.01, -0.01, 1.01, -1.0, 2.67, 2.68, 0.04, 0.05,
              10.0, 100.0, 55.55, 77.0, 88.0, 99.99, 1234.56, -50.0,
              12.34, 5.0, 33.0, 44.0, -327.53]
VALUE_POOL = [0.005, -0.005, 1.115, -1.005, 2.675, 0.0, 1.0, 5.0,
              7.25, -7.25, 9.99, 42.0, 100.0, 0.5, 1.25]
PROPS_POOL = ['{"k": 1}', '{"k": 0}', '{"k": -3}', '{"k": 4}',
              '{"k": null}', '{"other": 7}', "{}", "",
              "{k:", '{"k": "x"}', '{"k": "5"}', '{"k": 2.7}',
              '{"k": true}', '{"k": -7}', "[1, 2]", '"scalar"',
              '{"k": 9223372036854775808}']
SPECIAL_DATES = [datetime(1996, 2, 29), datetime(2000, 2, 29),
                 datetime(1999, 12, 31), datetime(2000, 1, 1),
                 datetime(2000, 1, 31), datetime(2001, 6, 30),
                 datetime(2001, 7, 1), datetime(2001, 7, 31),
                 datetime(2001, 8, 1)]
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
TYPES = ["view", "click", "purchase", "signup", "error"]


def _rand_date(rng) -> datetime:
    if rng.random() < 0.3:
        return rng.choice(SPECIAL_DATES)
    day = rng.randrange((datetime(2001, 8, 1) - datetime(1995, 1, 1)).days)
    return datetime(1995, 1, 1) + timedelta(days=day)


def build_random_fixture(path: str, seed: int) -> None:
    """Referentially consistent random warehouse: all FKs valid (join
    misses come from childless parents, the curated fixture's approach —
    dangling keys and NULL keys are ingest-side contracts)."""
    import random

    import duckdb

    from tests.test_fuzz_parity_relational import PRIOS, TABLES
    from tools.fuzz_seeds_probe import random_corpus

    rng = random.Random(seed)
    con = duckdb.connect()

    n_region = rng.randint(2, 4)
    con.execute("CREATE TABLE region (r_regionkey INTEGER, r_name VARCHAR)")
    for k in range(n_region):
        con.execute("INSERT INTO region VALUES (?, ?)", [k, f"REGION_{k}"])

    # last region deliberately childless when >2 regions
    n_nation = rng.randint(4, 8)
    parent_regions = max(1, n_region - (1 if n_region > 2 else 0))
    con.execute("CREATE TABLE nation (n_nationkey INTEGER, n_name VARCHAR, "
                "n_regionkey INTEGER)")
    for k in range(n_nation):
        con.execute("INSERT INTO nation VALUES (?, ?, ?)",
                    [k, f"NATION_{k}", rng.randrange(parent_regions)])

    n_cust = rng.randint(8, 20)
    con.execute("CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, "
                "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    for k in range(n_cust):
        # duplicate names and balance ties appear by pool reuse
        name = f"Customer#{rng.randrange(max(3, n_cust - 2)):09d}"
        con.execute("INSERT INTO customer VALUES (?, ?, ?, ?, ?)",
                    [k, name, rng.randrange(n_nation),
                     rng.choice(PRICE_POOL), rng.choice(SEGMENTS)])

    n_supp = rng.randint(3, 8)
    con.execute("CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, "
                "s_nationkey INTEGER, s_acctbal DOUBLE)")
    for k in range(n_supp):
        con.execute("INSERT INTO supplier VALUES (?, ?, ?, ?)",
                    [k, f"Supplier#{k:09d}", rng.randrange(n_nation),
                     rng.choice(PRICE_POOL)])

    n_part = rng.randint(5, 12)
    con.execute("CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR, "
                "p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, "
                "p_retailprice DOUBLE)")
    part_names = ["cold widget", "large bolt", "small bolt", "free sample",
                  "never ordered", "warm gear"]
    for k in range(n_part):
        con.execute("INSERT INTO part VALUES (?, ?, ?, ?, ?, ?)",
                    [k, rng.choice(part_names),
                     f"Brand#{rng.choice([5, 13, 19])}",
                     rng.choice(["ECONOMY", "PROMO", "STANDARD"]),
                     rng.choice([0, 1, 2, 3, 5]),
                     abs(rng.choice(PRICE_POOL))])

    # orders: first customers get orders; the tail stays childless
    n_orders = rng.randint(30, 90)
    ordering_custs = max(2, n_cust - rng.randint(1, 3))
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
                "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    dates = []
    for k in range(n_orders):
        d = _rand_date(rng)
        dates.append(d)
        con.execute("INSERT INTO orders VALUES (?, ?, ?, ?, ?, ?)",
                    [k, rng.randrange(ordering_custs),
                     rng.choice(["F", "O", "P"]), rng.choice(PRICE_POOL),
                     d, rng.choice(PRIOS)])
    # sometimes tie a second order AT the max date (anchor-tie hazard)
    if rng.random() < 0.5:
        con.execute("INSERT INTO orders VALUES (?, ?, ?, ?, ?, ?)",
                    [n_orders, rng.randrange(ordering_custs), "O",
                     rng.choice(PRICE_POOL), max(dates), rng.choice(PRIOS)])
        n_orders += 1

    con.execute("CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT, "
                "l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
                "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
                "l_returnflag VARCHAR, l_linestatus VARCHAR, "
                "l_shipdate TIMESTAMP)")
    shipping_parts = max(1, n_part - 1)          # last part never ordered
    shipping_supps = max(1, n_supp - 1)          # last supplier never ships
    for k in range(n_orders):
        n_items = rng.choice([0, 0, 1, 1, 2, 2, 3, 5])   # some abandoned
        od = dates[k] if k < len(dates) else max(dates)
        # co-purchase pattern: parts drawn from a small prefix so pairs
        # and triangles recur across orders
        prefix = rng.randint(2, shipping_parts)
        for ln in range(1, n_items + 1):
            qty = rng.choice([0.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 50.0])
            price = rng.choice(PRICE_POOL)
            ship = od + timedelta(days=rng.randint(-2, 90))
            con.execute(
                "INSERT INTO lineitem VALUES "
                "(?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                [k, rng.randrange(prefix), rng.randrange(shipping_supps),
                 ln, qty, abs(price),
                 rng.choice([0.0, 0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.5, 1.0]),
                 rng.choice([0.0, 0.0, 0.01, 0.02, 0.05, 0.08, 0.1]),
                 rng.choice(["N", "R", "A"]), rng.choice(["O", "F"]), ship])

    # events: per-user hazard-pattern chains
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    ev: list[tuple] = []
    B = datetime(2024, 1, 5)

    def e(ts, uid, typ, val, props='{"k": 1}'):
        ev.append((len(ev), ts, uid, typ, val, props))

    n_users = rng.randint(6, 12)
    # a couple of custkey-matching ids keep stream-static joins non-vacuous
    uids = [rng.randrange(ordering_custs) for _ in range(2)] + [
        100 + i for i in range(n_users - 2)
    ]
    for uid in uids:
        pattern = rng.choice(["singleton", "constant_run", "hour_chain",
                              "gap_chain", "dup_ts", "spread", "random"])
        base = B + timedelta(days=rng.randint(0, 6),
                             hours=rng.randint(0, 20))
        if pattern == "singleton":
            e(base, uid, rng.choice(TYPES), rng.choice(VALUE_POOL),
              rng.choice(PROPS_POOL))
        elif pattern == "constant_run":
            v = rng.choice(VALUE_POOL)
            t = base + timedelta(minutes=5)
            for _ in range(rng.randint(3, 8)):
                e(t, uid, rng.choice(TYPES[:2]), v, rng.choice(PROPS_POOL))
        elif pattern == "hour_chain":
            for i, typ in enumerate(rng.sample(TYPES, rng.randint(2, 4))):
                e(base + timedelta(hours=i), uid, typ,
                  rng.choice(VALUE_POOL), rng.choice(PROPS_POOL))
        elif pattern == "gap_chain":
            t = base
            for i in range(rng.randint(2, 5)):
                e(t, uid, rng.choice(TYPES), rng.choice(VALUE_POOL))
                t += timedelta(minutes=30,
                               microseconds=rng.choice([0, 0, 1]))
        elif pattern == "dup_ts":
            for _ in range(rng.randint(2, 4)):
                e(base, uid, rng.choice(TYPES), rng.choice(VALUE_POOL),
                  rng.choice(PROPS_POOL))
        elif pattern == "spread":
            for d in range(rng.randint(3, 7)):
                e(B + timedelta(days=d, hours=6), uid, "view", float(d))
        else:
            for _ in range(rng.randint(2, 10)):
                e(B + timedelta(days=rng.randint(0, 6),
                                hours=rng.randint(0, 23),
                                minutes=rng.randint(0, 59)),
                  uid, rng.choice(TYPES), rng.choice(VALUE_POOL),
                  rng.choice(PROPS_POOL))
    for row in ev:
        con.execute("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", list(row))

    # embeddings: float32-exact integer grids + curated hazard vectors
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    DIM = 64
    n_vec = rng.randint(30, 70)
    a, b = rng.randint(3, 17), rng.randint(3, 17)
    base_vec = [(((i * a + j * b) % 19) - 9) / 9.0
                for i, j in [(1, j) for j in range(DIM)]]
    vecs = [
        (0, [0.0] * DIM, 0),
        (1, list(base_vec), 1),
        (2, list(base_vec), 1),
        (3, [-x for x in base_vec], 2),
        (4, [1e-42] * DIM, 3),
        (5, [1e-42] * DIM, 3),
        (6, [rng.choice([127.0, -127.0])] * DIM, 4),
    ]
    for i in range(7, n_vec):
        vecs.append((i, [(((i * a + j * b) % 19) - 9) / 9.0
                         for j in range(DIM)], i % 10))
    for vid, v, lab in vecs:
        con.execute("INSERT INTO embeddings VALUES (?, ?, ?)", [vid, v, lab])

    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for i, (text, lang, source) in enumerate(random_corpus(seed)):
        con.execute("INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
                    [i, text, lang, source, len(text)])

    for t in TABLES:
        con.execute(f"COPY {t} TO '{path}/{t}.parquet' (FORMAT PARQUET)")
    con.close()


def main() -> None:
    args = sys.argv[1:]
    n_seeds, start, skip_streaming = 8, 200, False
    if "--seeds" in args:
        n_seeds = int(args[args.index("--seeds") + 1])
    if "--start" in args:
        start = int(args[args.index("--start") + 1])
    if "--skip-streaming" in args:
        skip_streaming = True

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as entry
    from databricks_spark_sql_challenge1_spark.session import get_spark
    from tests.test_fuzz_parity_relational import TABLES, _relational_names

    q, o = entry.queries(), entry.oracle_sql()
    names = _relational_names()
    # Same class as the test module's CONTRACT_EXCLUDED
    # (approx_price_percentiles, already filtered): the approx-RFM
    # sketch-audit booleans assume the documented agreement floor's
    # premise that eps*n customers make up the cutoff flip band — on a
    # random 8-20-customer warehouse ONE boundary customer is >=5-12%
    # disagreement, blowing RFM_AGREE_MIN=0.9 while the quantile VALUES
    # stay bit-exact (measured: seeds 210-212, only tile_agreement_ok
    # flipped). The curated fixture keeps it in the pinned test.
    names = [n for n in names if n != "customer_rfm_segments_approx"]
    if skip_streaming:
        names = [n for n in names if not n.startswith("streaming_")]
    spark = get_spark("fuzz-rel-seeds-probe")
    print(f"{len(names)} relational names x {n_seeds} seeds "
          f"[{start}..{start + n_seeds})", flush=True)

    bad = []
    for seed in range(start, start + n_seeds):
        d = tempfile.mkdtemp(prefix=f"fuzzrel{seed}-")
        t0 = time.monotonic()
        try:
            build_random_fixture(d, seed)
            con = duckdb.connect()
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * "
                            f"FROM '{d}/{t}.parquet'")
            seed_bad = []
            for name in names:
                try:
                    srows = sorted(
                        tuple(str(x) for x in r)
                        for r in q[name](spark, d).collect()
                    )
                except Exception as exc:  # noqa: BLE001 — keep probing
                    seed_bad.append((name, f"spark-err: {str(exc)[:150]}"))
                    continue
                drows = sorted(
                    tuple(str(x) for x in r)
                    for r in con.execute(o[name]).fetchall()
                )
                if srows != drows:
                    first = next(
                        (f"{a[:6]} vs {b[:6]}"
                         for a, b in zip(srows, drows) if a != b),
                        f"row counts {len(srows)} vs {len(drows)}",
                    )
                    seed_bad.append((name, f"diff: {first}"))
            con.close()
            status = "OK" if not seed_bad else f"BAD {seed_bad}"
            print(f"seed {seed}: {status} "
                  f"({time.monotonic() - t0:.1f}s)", flush=True)
            bad.extend((seed, *b) for b in seed_bad)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print("bad:", bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
