"""ICU chain subset (functions/icu.py): compile checks, end-to-end
indexing with query-side folding, and build_meta round-trip."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from idzebra_spark import oracle
from idzebra_spark.functions.icu import icu_chain_to_charmap


def test_shipped_reference_chains_compile():
    for f in ("words-icu.xml", "phrases-icu.xml", "words-icu-da.xml"):
        cm = icu_chain_to_charmap(open(f"/root/reference/tab/{f}").read())
        assert cm.fold_str("Don't!") == "dont!"[:4] + "!"
        # without an accent-fold transform the accented char survives
        assert cm.fold_str("Café") == "café"


def test_fold_chain_semantics():
    cm = icu_chain_to_charmap(oracle.ICU_DEMO_XML)
    assert cm.fold_str("Don't") == "dont"          # joiner deletes
    assert cm.fold_str("Café") == "cafe"           # Latin-ASCII
    assert cm.fold_str("Straße") == "strasse"      # ligature expand
    assert cm.fold_str("smørrebrød") == "smorrebrod"
    assert cm.fold_str("a\x02b") == "ab"           # control joins
    # boundary punctuation is NOT deleted — it splits via the value set
    import re

    toks = [t for t in re.split(cm.split_regex, cm.fold_str("STOP—now"))
            if t]
    assert toks == ["stop", "now"]


def test_unsupported_rules_raise():
    with pytest.raises(ValueError, match="transform rule"):
        icu_chain_to_charmap(
            '<icu_chain><transform rule="Any-Cyrillic"/>'
            '<casemap rule="l"/></icu_chain>')
    with pytest.raises(ValueError, match="casemap"):
        icu_chain_to_charmap(
            '<icu_chain><transform rule="Latin-ASCII"/></icu_chain>')
    with pytest.raises(ValueError, match="element"):
        icu_chain_to_charmap(
            '<icu_chain><mystery/><casemap rule="l"/></icu_chain>')


def test_index_build_and_accented_query(spark, sf_dir):
    """An ICU-configured index folds both the corpus AND raw query
    terms (through the api facade's _fold_term), so 'BRÛLÉE' finds
    the doc that spelled it 'brulee'-equivalent — and the config
    round-trips through build_meta."""
    from pyspark.sql import functions as F

    from idzebra_spark.api import ZebraSpark

    cm = icu_chain_to_charmap(oracle.ICU_DEMO_XML)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .withColumn(
            "text",
            F.when(F.col("doc_id") == 7,
                   F.lit("Crème BRÛLÉE, don't stop"))
            .otherwise(F.col("text")))
    )
    base = tempfile.mkdtemp(prefix="idz_icu_")
    p = base + "/idx"
    z = ZebraSpark(spark, p)
    z.build(docs, shard_size=16, block_size=8, alphabet=cm)
    hits = z.search("brûlée", 5).collect()
    assert [r["doc_id"] for r in hits] == [7]
    hits2 = z.search("dont", 5).collect()
    assert 7 in [r["doc_id"] for r in hits2]

    # a FRESH handle re-reads the persisted charmap from build_meta
    z2 = ZebraSpark(spark, p)
    hits3 = z2.search("BRÛLÉE", 5).collect()
    assert [r["doc_id"] for r in hits3] == [7]
    shutil.rmtree(base, ignore_errors=True)
