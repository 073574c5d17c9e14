"""python -m idzebra_spark — the zebraidx/zebrasrv CLI surface.

Commands run in-process (get_spark reuses the pytest session via
getOrCreate), with stdout captured."""

import json

import pytest

from idzebra_spark.__main__ import _fields, main


@pytest.fixture(scope="module")
def cli_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    corpus = str(base / "docs.parquet")
    spark.createDataFrame(
        [(0, "Café merge sort", "s0"), (1, "cafe scan line", "s1"),
         (2, "plain text here", "s0"), (3, "merge of the sort", "s1")],
        ["doc_id", "text", "source"],
    ).write.parquet(corpus)
    chr_path = base / "demo.chr"
    chr_path.write_text("lowercase {0-9}{a-z}\nmap é e\n")
    return {"corpus": corpus, "index": str(base / "idx"),
            "chr": str(chr_path)}


def _run(capsys, *argv) -> str:
    assert main(list(argv)) == 0
    return capsys.readouterr().out


def test_cli_build_search_scan_info(cli_env, capsys):
    out = _run(capsys, "build", "--index", cli_env["index"],
               "--corpus", cli_env["corpus"],
               "--alphabet", cli_env["chr"], "--shard-size", "8")
    assert json.loads(out.strip().splitlines()[-1])["docs"] == 4

    # NO --alphabet: the .chr charmap is adopted from the index's
    # persisted build_meta — café still folds to cafe. --corpus is
    # also optional: search is served from the index alone.
    out = _run(capsys, "search", "--index", cli_env["index"],
               "café OR merge", "-k", "5")
    lines = out.strip().splitlines()
    assert lines[0].split("\t") == ["doc_id", "score_milli"]
    ids = {int(l.split("\t")[0]) for l in lines[1:]}
    assert ids == {0, 1, 3}  # café folds to cafe via the stored map

    out = _run(capsys, "scan", "--index", cli_env["index"],
               "merge", "--after", "3")
    assert out.splitlines()[1].startswith("merge\t")

    out = _run(capsys, "info", "--index", cli_env["index"])
    assert json.loads(out.strip().splitlines()[-1])["n_docs"] == 4


def test_cli_fetch_and_update(cli_env, spark, capsys):
    out = _run(capsys, "fetch", "--index", cli_env["index"],
               "--corpus", cli_env["corpus"], "--ids", "0,2",
               "--elements", "meta")
    lines = out.strip().splitlines()
    assert lines[0].split("\t") == ["doc_id", "source"]
    assert {l.split("\t")[0] for l in lines[1:]} == {"0", "2"}

    newc = cli_env["corpus"] + "_v2"
    spark.read.parquet(cli_env["corpus"]).unionByName(
        spark.createDataFrame([(9, "added merge doc", "s9")],
                              ["doc_id", "text", "source"])
    ).write.parquet(newc)
    # update with NO flags: shard size, positions and the .chr
    # alphabet all come from the index's build_meta
    _run(capsys, "update", "--index", cli_env["index"], "--corpus", newc)
    out = _run(capsys, "search", "--index", cli_env["index"],
               "merge", "-k", "10")
    ids = {int(l.split("\t")[0]) for l in out.strip().splitlines()[1:]}
    assert 9 in ids


def test_fields_spec_parsing():
    assert _fields("w:source,tags;p:lang") == {
        "w": ["source", "tags"], "p": ["lang"]}
    assert _fields(None) is None
    with pytest.raises(SystemExit):
        _fields("x:bad")
