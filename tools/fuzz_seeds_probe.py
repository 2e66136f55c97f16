"""Multi-seed random-corpus sweep over the documents-only oracle surface.

tests/test_fuzz_parity.py pins two corpora: the hand-curated adversarial
list (one doc per known hazard class) and ONE seeded collision corpus
(seed 13). This probe is the search instrument behind that pin: it
sweeps MANY seeds, each generating a random corpus by composing the
in-contract hazard classes the curated list enumerates one at a time —
tiny collision alphabets (shingle/band/merge-pair saturation), natural
words, measured-ALIGNED unicode classes (accents, CJK, Cyrillic,
fullwidth, NBSP, NFD/NFC, emoji — the divergent SpecialCasing classes
stay excluded per test_unicode_case_mapping_contract), regex metachars,
quotes, PII-shaped strings, digit runs, long words and long docs,
empty/whitespace-only docs. Random COMPOSITION explores interactions
the one-per-class list cannot (a whitespace-run inside a collision doc,
PII next to fullwidth, a 200-token doc of regex metachars).

Each seed: build corpus -> run every documents-only oracle-backed query
Spark-vs-DuckDB on it (the grading driver's sorted-stringified-row
compare) -> report per-seed. Any mismatch is a real cross-engine
divergence to fix or pin; exit 1.

``--multimodal`` switches to the ASCII-ONLY corpus (no unicode pool, no
NBSP special — the codec witnesses synthesize payloads from text and
their fixture guard raises on non-ASCII by design) and sweeps the 13
multimodal_* oracle-backed names instead: the one documents surface the
default sweep must skip. First run of this mode caught two real
empty-payload divergences (frame_stats' missing max(1,·) floor in the
oracle; audio_pcm_stats' empty-aggregate NULLs vs the kernel's 0-guard)
— pinned in tests/test_multimodal.py::
test_empty_text_payload_parity_contract.

Usage:
    python tools/fuzz_seeds_probe.py [--seeds N] [--start S] [--multimodal]

Default: 24 seeds from 100. Deterministic per seed (stdlib Random).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

# In-contract token pools (every class measured aligned by the r13/r15
# campaigns; the divergent unicode SpecialCasing classes are excluded).
POOLS = [
    ["a", "b", "ab", "aa", "ba", "aab"],                       # collision
    ["the", "quick", "brown", "fox", "data", "test", "and",
     "of", "to", "word"] + [f"tok{i}" for i in range(9)],      # words
    ["héllo", "wörld", "café", "naïve", "日本語", "テスト",
     "漢字", "ТЕСТ", "Данные", "слов", "ＴＥＳＴ", "ｄａｔａ",
     "🎉", "🚀", "café", "café"],                    # aligned unicode
    ["a.b", "a*b", "(x)", "[y]", "{z}", "a|b", "a+b", "a?b",
     "it's", '"quoted"', "o'clock", "!!!", "???", ";;;"],      # metachars
    ["bob@example.com", "alice@test.org", "555-123-4567",
     "123", "456789", "0", "-1", "3.14"],                      # PII/digits
]

SPECIALS = [
    "",                     # empty doc
    "   ",                  # spaces only
    "\t\n \t",              # tabs/newlines only
    "w" * 300,              # very long word
    "  leading and trailing  ",
    "alpha beta gamma",   # NBSP runs
]

LANGS = ["en", "es", "de", "fr", "zh"]


def random_corpus(seed: int, ascii_only: bool = False) -> list:
    """Seeded random composition over the in-contract pools: returns
    [(text, lang, source), ...]. ascii_only drops the unicode pool and
    the NBSP special (the multimodal codec-witness corpus contract)."""
    import random

    rng = random.Random(seed)
    pool_set = [p for p in POOLS if not ascii_only or p is not POOLS[2]]
    n_docs = rng.choice([12, 25, 40, 70])
    pools = rng.sample(pool_set, rng.randint(1, 3))
    alphabet = [t for p in pools for t in p]
    docs = []
    for _ in range(n_docs):
        r = rng.random()
        if r < 0.08:
            specials = [s for s in SPECIALS
                        if not ascii_only or s.isascii()]
            text = rng.choice(specials)
        else:
            n_toks = rng.choice([0, 1, 2, 3, 5, 8, 20, 60, 200])
            sep = " " if rng.random() < 0.9 else rng.choice(["  ", " \t "])
            text = sep.join(rng.choice(alphabet) for _ in range(n_toks))
            if rng.random() < 0.1:
                text = " " + text + "  "
        docs.append((text, rng.choice(LANGS), f"src{rng.randrange(4)}"))
    # guarantee at least one exact-dup pair per corpus (dedup surfaces)
    if len(docs) >= 2:
        docs[-1] = docs[0]
    return docs


def main() -> None:
    args = sys.argv[1:]
    n_seeds, start = 24, 100
    if "--seeds" in args:
        i = args.index("--seeds")
        n_seeds = int(args[i + 1])
    if "--start" in args:
        i = args.index("--start")
        start = int(args[i + 1])
    multimodal = "--multimodal" in args

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as entry
    from databricks_spark_sql_challenge1_spark.session import get_spark
    from tests.test_fuzz_parity import _documents_only_names, _write_docs

    q, o = entry.queries(), entry.oracle_sql()
    if multimodal:
        names = sorted(n for n in o if n.startswith("multimodal_"))
    else:
        # the pinned test skips the I/O-format roundtrips (format tests,
        # not text semantics) but the PROBE runs them: JSONL escaping of
        # random metachar/unicode text is a real divergence surface
        # (measured clean, seeds 100-102 at introduction)
        names = _documents_only_names() + sorted(
            n for n in o if n.startswith(("jsonl_", "orc_"))
        )
    spark = get_spark("fuzz-seeds-probe")
    print(f"{len(names)} {'multimodal' if multimodal else 'documents-only'} "
          f"names x {n_seeds} seeds [{start}..{start + n_seeds})"
          + (" (ASCII corpus)" if multimodal else ""), flush=True)

    bad = []
    for seed in range(start, start + n_seeds):
        d = tempfile.mkdtemp(prefix=f"fuzzseed{seed}-")
        t0 = time.monotonic()
        try:
            _write_docs(d, random_corpus(seed, ascii_only=multimodal))
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS SELECT * "
                f"FROM '{d}/documents.parquet'"
            )
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
