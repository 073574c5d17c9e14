"""``python -m idzebra_spark`` — the zebraidx/zebrasrv command-line
surface (/root/reference/index/zebraidx.c: update/commit/clean verbs;
doc/zebraidx.xml) over the Spark engine.

    python -m idzebra_spark build   --index IDX --corpus docs.parquet
    python -m idzebra_spark update  --index IDX --corpus docs2.parquet
    python -m idzebra_spark search  --index IDX --corpus docs.parquet \\
        '(merge OR sort) AND scan' -k 10
    python -m idzebra_spark search  --index IDX1,IDX2 'merge'   # multi-db
    python -m idzebra_spark scan    --index IDX merge --after 5
    python -m idzebra_spark info    --index IDX
    python -m idzebra_spark fetch   --index IDX --corpus docs.parquet \\
        --ids 1,2,3 --elements meta
    python -m idzebra_spark compact --index IDX
    python -m idzebra_spark vacuum  --index IDX
    python -m idzebra_spark check   --index IDX [--quick]

Corpora are parquet files/directories with (doc_id, text, ...) —
zebraidx's record directories map to parquet datasets here. The
``--alphabet`` option accepts the built-in names (ascii, unicode,
fold) or a ``.chr`` charmap FILE path (tab/string.chr syntax).
Results print as TSV on stdout; ``info``/build metrics as JSON.
"""

from __future__ import annotations

import argparse
import json
import sys


def _alphabet(spec: str):
    if spec in ("ascii", "unicode", "fold"):
        return spec
    from idzebra_spark.functions.charmap import charmap_from_chr

    with open(spec) as f:
        return charmap_from_chr(f.read())


def _fields(spec: str | None) -> dict | None:
    """``w:source,tags;p:lang`` → {"w": [...], "p": [...]}."""
    if not spec:
        return None
    out: dict[str, list[str]] = {}
    for part in spec.split(";"):
        if ":" not in part:
            raise SystemExit(
                f"bad --fields segment {part!r} (expected type:col,...)")
        kind, cols = part.split(":", 1)
        if kind not in ("w", "p"):
            raise SystemExit(f"unknown index type {kind!r} (use w or p)")
        out.setdefault(kind, []).extend(c for c in cols.split(",") if c)
    return out


def _print_df(df, limit: int = 1000) -> None:
    cols = df.columns
    print("\t".join(cols))
    rows = df.limit(limit + 1).collect()
    for r in rows[:limit]:
        print("\t".join("" if r[c] is None else str(r[c]) for c in cols))
    if len(rows) > limit:
        print(f"... output truncated at {limit} rows", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="idzebra_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, corpus=False):
        sp.add_argument("--index", required=True)
        if corpus:
            # required only where the corpus is actually read
            sp.add_argument("--corpus", required=(corpus == "req"))
        # None = adopt the alphabet the index was BUILT with
        # (persisted in build_meta); a value overrides it
        sp.add_argument("--alphabet", default=None)
        sp.add_argument("--cpus", type=int, default=None)

    for verb in ("build", "update"):
        sp = sub.add_parser(verb)
        common(sp, corpus="req")
        sp.add_argument("--fields", default=None,
                        help="w:col1,col2;p:col3 (Zebra index types)")
        # build/update defaults come from the index's build_meta when
        # it exists (a fresh build uses the engine default); explicit
        # values that MISMATCH a committed register raise rather than
        # corrupt (register-config guard in build_index)
        sp.add_argument("--shard-size", type=int, default=None)
        sp.add_argument("--no-positions", action="store_true",
                        default=None)
        sp.add_argument("--match-cols", default=None,
                        help="comma-list of record-identity columns "
                             "(Zebra match spec): updates resolve "
                             "records by this key, preserving the "
                             "internal id across re-keyed crawls")

    sp = sub.add_parser("search")
    common(sp, corpus=True)  # optional: search is index-only
    sp.add_argument("query")
    sp.add_argument("-k", type=int, default=10)

    sp = sub.add_parser("scan")
    common(sp)
    sp.add_argument("seed")
    sp.add_argument("--after", type=int, default=10)
    sp.add_argument("--before", type=int, default=0)
    sp.add_argument("--limit-query", default=None)
    sp.add_argument("--field", default=None,
                    help="register name, or comma-list for a merged "
                         "multi-ordinal scan")

    sp = sub.add_parser("fetch")
    common(sp, corpus="req")
    sp.add_argument("--ids", required=True)
    sp.add_argument("--elements", default="full",
                    choices=["full", "meta", "head", "index"])

    for verb in ("info", "compact", "vacuum"):
        common(sub.add_parser(verb))

    sp = sub.add_parser("check")
    common(sp)
    sp.add_argument("--quick", action="store_true",
                    help="metadata cross-checks only (skip the full "
                         "block-payload decode pass)")

    a = p.parse_args(argv)

    from idzebra_spark.api import ZebraSpark
    from idzebra_spark.session import get_spark

    spark = get_spark("idzebra-cli",
                      master=f"local[{a.cpus}]" if a.cpus else None,
                      shuffle_partitions=a.cpus)  # partitions==cores
    alphabet = _alphabet(a.alphabet) if a.alphabet else None

    corpus = None
    if getattr(a, "corpus", None):
        corpus = spark.read.parquet(a.corpus)
    # read verbs accept a comma-separated DATABASE LIST (multi-db
    # search facade, zebraapi.c:1079-1112); write verbs reject lists
    # loudly rather than treating "A,B" as one literal path
    index: "str | list[str]" = a.index
    if "," in a.index:
        if a.cmd not in ("search", "scan", "fetch", "info"):
            raise SystemExit(
                f"{a.cmd} takes a single index path — database lists "
                "are for the read verbs (search/scan/fetch/info)")
        index = [p for p in a.index.split(",") if p]
    z = ZebraSpark(spark, index, corpus=corpus, alphabet=alphabet)

    if a.cmd in ("build", "update"):
        # pass only what the user gave: update's defaults come from
        # the index's persisted build_meta (the facade enforces it)
        kw = {}
        if a.shard_size is not None:
            kw["shard_size"] = a.shard_size
        if a.no_positions is not None:
            kw["store_positions"] = not a.no_positions
        if alphabet is not None:
            kw["alphabet"] = alphabet
        f = _fields(a.fields)
        if f is not None:
            kw["fields"] = f
        if a.match_cols:
            kw["match_cols"] = [c for c in a.match_cols.split(",") if c]
        m = (z.build if a.cmd == "build" else z.update)(corpus, **kw)
        print(json.dumps({k: v for k, v in m.items()
                          if isinstance(v, (int, float, str))}))
    elif a.cmd == "search":
        _print_df(z.search(a.query, a.k))
    elif a.cmd == "scan":
        field = a.field.split(",") if a.field and "," in a.field \
            else a.field
        _print_df(z.scan(a.seed, a.after, a.before,
                         limit_query=a.limit_query, field=field))
    elif a.cmd == "fetch":
        ids = [int(x) for x in a.ids.split(",") if x]
        _print_df(z.fetch(ids, elements=a.elements))
    elif a.cmd == "info":
        print(json.dumps(z.info()))
    elif a.cmd == "compact":
        print(json.dumps(z.compact()))
    elif a.cmd == "vacuum":
        print(json.dumps({"removed": len(z.vacuum())}))
    elif a.cmd == "check":
        # zebra_register_check (check_res.c): nonzero exit on any
        # violated register invariant (list rejection happened above)
        from idzebra_spark.operators.check import check_index

        r = check_index(spark, a.index, full=not a.quick)
        print(json.dumps(r))
        return 0 if r["ok"] else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
