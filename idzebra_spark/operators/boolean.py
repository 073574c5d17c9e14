"""Result-set (dataflow) operator layer — Zebra's ``rset/`` family as
DataFrame plans over the logical postings relation (doc_id, term, pos).

Scope semantics (/root/reference/include/rset.h:172-183): scope 2 =
"same document" → joins/aggregations on doc_id; scope 1 = "same
position" → predicates over (doc_id, pos). Each function returns a
DataFrame of matching doc_ids (or (doc_id, pos) for position-level
ops), composable like the rset DAG built by rpn_search_structure
(/root/reference/index/rpnsearch.c:2567-2772).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idzebra_spark.functions.tokenizer import tokenize


FIELD_SEP = "\x1f"  # ordinal prefix on the term key — Zebra prefixes
# dictionary terms with the SU-encoded field ordinal
# (/root/reference/util/su_codec.c:32-76); a composite string key is
# the same trick and keeps every downstream operator field-aware for
# free (the segment layer works unchanged on composite terms).


def fielded_term(field: str, term: str) -> str:
    return f"{field}{FIELD_SEP}{term.lower()}"


class PostingsOps:
    """Boolean/proximity/truncation algebra over a tokenized corpus.

    ``fields``: optional extra indexed fields beyond the main text —
    ``{"w": ["source"], "p": ["lang"]}`` maps Zebra index types
    (tab/default.idx: `w` word-split, `p` complete-field) to columns.
    Their postings carry composite ``field\\x1fterm`` keys, queried via
    :func:`fielded_term` — the multi-ordinal data model of SURVEY §1.
    """

    def __init__(self, corpus: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 fields: dict[str, list[str]] | None = None,
                 alphabet: str = "ascii"):
        self.corpus = corpus
        self.text_col = text_col
        self.id_col = id_col
        self.alphabet = alphabet
        if fields:
            # ONE implementation of the composite-key construction,
            # shared with the segment build path (operators.segment)
            from idzebra_spark.operators.segment import fielded_postings

            posting = fielded_postings(corpus, fields, alphabet,
                                       text_col=text_col, id_col=id_col)
        else:
            posting = tokenize(corpus, text_col, id_col, alphabet)
        self.posting = posting

    # ------------------------------------------------------------ leaves

    def term_docs(self, term: str) -> DataFrame:
        """rsisamb leaf at scope 2 (/root/reference/rset/rsisamb.c:37-48):
        distinct docs containing the term."""
        return (
            self.posting.where(F.col("term") == term.lower())
            .select("doc_id").distinct()
        )

    def term_positions(self, term: str) -> DataFrame:
        """Leaf at scope 1: (doc_id, pos) stream."""
        return self.posting.where(F.col("term") == term.lower()).select(
            "doc_id", "pos"
        )

    def null_set(self) -> DataFrame:
        """rsnull (/root/reference/rset/rsnull.c)."""
        return self.posting.select("doc_id").limit(0)

    # ----------------------------------------------------------- boolean

    def and_(self, sets: list[DataFrame]) -> DataFrame:
        """n-ary AND — rsmulti_and zig-zag intersection
        (/root/reference/rset/rsmultiandor.c:452-556) as inner joins;
        Catalyst/AQE picks broadcast for small sides."""
        return reduce(lambda a, b: a.join(b, "doc_id"), sets)

    def or_(self, sets: list[DataFrame]) -> DataFrame:
        """n-ary OR — rsmulti_or heap merge
        (/root/reference/rset/rsmultiandor.c:95-180) as UNION+distinct."""
        return reduce(lambda a, b: a.unionByName(b), sets).distinct()

    def not_(self, left: DataFrame, right: DataFrame) -> DataFrame:
        """AND-NOT — rsbool ordered difference merge
        (/root/reference/rset/rsbool.c:173-225) as LEFT ANTI JOIN."""
        return left.join(right, "doc_id", "left_anti")

    # --------------------------------------------------------- proximity

    def prox(
        self,
        t1: str,
        t2: str,
        relation: str = "=",
        distance: int = 1,
        ordered: bool = True,
    ) -> DataFrame:
        """Proximity — rsprox pairwise seqno comparison
        (/root/reference/rset/rsprox.c:162-213: ordered fast path checks
        ``diff relation distance`` where diff = seqno2 - seqno1;
        unordered uses |diff|). Returns distinct matching doc_ids."""
        p1 = self.term_positions(t1).alias("a")
        p2 = self.term_positions(t2).alias("b")
        diff = F.col("b.pos") - F.col("a.pos")
        if not ordered:
            diff = F.abs(diff)
        ops = {
            "<": diff < distance, "<=": diff <= distance,
            "=": diff == distance, ">=": diff >= distance,
            ">": diff > distance, "<>": diff != distance,
        }
        cond = (F.col("a.doc_id") == F.col("b.doc_id")) & ops[relation]
        if ordered:
            # the reference never counts wrong-order pairs: the fast
            # path (rsprox.c:181-194, relations <,<=,=) requires the
            # second term strictly AFTER the first (cmp > 0); the
            # generic path (rsprox.c:249-277) requires diff >= 0
            floor0 = (
                (F.col("b.pos") - F.col("a.pos")) > 0
                if relation in ("<", "<=", "=")
                else (F.col("b.pos") - F.col("a.pos")) >= 0
            )
            cond = cond & floor0
        else:
            cond = cond & (F.col("a.pos") != F.col("b.pos"))
        return (
            p1.join(p2, cond)
            .select(F.col("a.doc_id").alias("doc_id"))
            .distinct()
        )

    def phrase(self, terms: list[str]) -> DataFrame:
        """Exact phrase = chained prox(ordered, '=', 1)
        (/root/reference/index/rpnsearch.c:1584-1587 combines token
        rsets with ordered distance-1 prox). Returns (doc_id, n_occ)."""
        base = self.term_positions(terms[0]).alias("p0")
        cond = None
        joined = base
        for i, t in enumerate(terms[1:], start=1):
            nxt = self.term_positions(t).alias(f"p{i}")
            joined = joined.join(
                nxt,
                (F.col("p0.doc_id") == F.col(f"p{i}.doc_id"))
                & (F.col(f"p{i}.pos") == F.col("p0.pos") + i),
            )
        return (
            joined.groupBy(F.col("p0.doc_id").alias("doc_id"))
            .agg(F.count("*").alias("n_occ"))
        )

    # -------------------------------------------------- truncation/regex

    def dictionary(self) -> DataFrame:
        return self.posting.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
        )

    def expand_prefix(self, prefix: str) -> DataFrame:
        """Right truncation ``term*`` — dict grep with exact prefix
        (/root/reference/index/rpnsearch.c:1148-1254; prefix chars passed
        to dict_lookup_grep as init_pos at :1269-1272). Returns terms."""
        return self.dictionary().where(
            F.col("term").startswith(prefix.lower())
        ).select("term")

    def expand_regex(self, pattern: str) -> DataFrame:
        """Regexp-1 (attr 5=102) — dict regex grep
        (/root/reference/index/rpnsearch.c:1186-1210) via rlike."""
        return self.dictionary().where(
            F.col("term").rlike(pattern)
        ).select("term")

    def expand_edit_distance(self, term: str, max_dist: int = 1) -> DataFrame:
        """Approximate grep (Wu-Manber over the dict trie,
        /root/reference/dict/lookupec.c) via levenshtein on the
        dictionary."""
        return self.dictionary().where(
            F.levenshtein(F.col("term"), F.lit(term.lower())) <= max_dist
        ).select("term")

    def trunc_docs(self, terms: DataFrame) -> DataFrame:
        """Combine postings of all matched terms, deduping the same doc
        across lists — rset_trunc's dedup rule
        (/root/reference/index/trunc.c:149,200: identical keys from
        multiple lists collapse). Spark: semi-join + distinct; no
        OR/heap-merge regime split needed (trunc.c:403-446) — Catalyst
        handles arbitrary fan-in."""
        return (
            self.posting.join(F.broadcast(terms), "term", "semi")
            .select("doc_id").distinct()
        )

    # ---------------------------------------------------- scan / facets

    def scan(self, seed: str, n_after: int = 10, n_before: int = 0,
             limit_set: DataFrame | None = None) -> DataFrame:
        """Dictionary browse around a seed term — zebra_scan
        (/root/reference/index/rpnscan.c:285-480): ``n_before`` terms
        strictly below the seed plus ``n_after`` from the seed up,
        alphabetical, with per-term df; optionally restricted to a
        limiting result set (scan_save_set, rpnscan.c:200-283)."""
        d = self.posting
        if limit_set is not None:
            d = d.join(limit_set.select("doc_id"), "doc_id", "semi")
        d = d.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        after = (
            d.where(F.col("term") >= seed.lower())
            .orderBy(F.asc("term")).limit(n_after)
        )
        if n_before <= 0:
            return after
        before = (
            d.where(F.col("term") < seed.lower())
            .orderBy(F.desc("term")).limit(n_before)
        )
        return before.unionByName(after).orderBy(F.asc("term"))

    def facets(self, hits: DataFrame, facet_col: str, n: int = 10) -> DataFrame:
        """Facet counts over a hit set — zebra::facet element sets
        (/root/reference/index/retrieve.c:698-840)."""
        src = self.corpus.select(
            F.col(self.id_col).alias("doc_id"), F.col(facet_col)
        )
        return (
            src.join(hits.select("doc_id"), "doc_id", "semi")
            .groupBy(facet_col)
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.asc(facet_col))
            .limit(n)
        )

    # --------------------------------------------- structural scoping

    def between(self, middle: str, left: str, right: str) -> DataFrame:
        """rsbetween — hits of the middle rset whose position lies
        inside a left..right tag span (/root/reference/rset/
        rsbetween.c:21-28: 'Shakespeare' between '<author>' and
        '</author>'; the reader tracks open-tag depth). Depth at
        position p = count(left.pos <= p) - count(right.pos < p) > 0.
        Declarative form: per-doc sorted marker arrays + a counting
        filter — no per-row Python."""
        left, right = left.lower(), right.lower()
        marks = (
            self.posting.where(F.col("term").isin([left, right]))
            .groupBy("doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("term") == left, F.col("pos"))
                    )
                ).alias("starts"),
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("term") == right, F.col("pos"))
                    )
                ).alias("ends"),
            )
        )
        mid = self.term_positions(middle)
        depth = (
            F.size(F.filter("starts", lambda s: s <= F.col("pos")))
            - F.size(F.filter("ends", lambda e: e < F.col("pos")))
        )
        return (
            mid.join(marks, "doc_id")
            .where(depth > 0)
            .select("doc_id").distinct()
        )

    def within_unit(self, t1: str, t2: str, boundary: str) -> DataFrame:
        """search_group unit scoping — Zebra resolves 'within
        sentence/paragraph' via a dedicated group index
        (/root/reference/index/rpnsearch.c:1433-1461). Here the unit
        id of a posting is derived from boundary-marker positions:
        unit(p) = count(boundary.pos < p); t1 and t2 must share a
        unit instance in the same doc."""
        b = (
            self.term_positions(boundary)
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("pos")).alias("barr"))
        )

        def unit_of(posting: DataFrame) -> DataFrame:
            j = posting.join(b, "doc_id", "left").select(
                "doc_id",
                F.size(
                    F.filter(
                        F.coalesce(F.col("barr"),
                                   F.array().cast("array<int>")),
                        lambda x: x < F.col("pos"),
                    )
                ).alias("unit"),
            )
            return j.distinct()

        u1 = unit_of(self.term_positions(t1))
        u2 = unit_of(self.term_positions(t2))
        return u1.join(u2, ["doc_id", "unit"]).select("doc_id").distinct()

    # ------------------------------------------------- result-set refs

    def store_set(self, name: str, hits: DataFrame) -> DataFrame:
        """Named result sets — an operand can reference a prior set
        (Z_Operand_resultSetId, /root/reference/index/rpnsearch.c:2743-2755).
        Cached so later queries reuse the materialized plan (rstemp,
        /root/reference/rset/rstemp.c)."""
        if not hasattr(self, "_sets"):
            self._sets = {}
        self._sets[name] = hits.cache()
        return self._sets[name]

    def get_set(self, name: str) -> DataFrame:
        return self._sets[name]

    # -------------------------------------------------------- snippets

    def snippets(self, term: str, hits: DataFrame, window: int = 2) -> DataFrame:
        """Hit-context windows — util/snippet.c ring buffer of context
        words around each hit (/root/reference/util/snippet.c,
        /root/reference/index/zsets.c:1340-1394). Returns the first
        occurrence per doc with ±window tokens joined by spaces."""
        from idzebra_spark.functions.tokenizer import tokenize_array

        first_pos = (
            self.term_positions(term)
            .join(hits, "doc_id", "semi")
            .groupBy("doc_id")
            .agg(F.min("pos").alias("pos"))
        )
        toks = self.corpus.select(
            F.col(self.id_col).alias("doc_id"),
            tokenize_array(F.col(self.text_col), self.alphabet).alias("toks"),
        )
        start = F.greatest(F.col("pos") - window, F.lit(1))
        length = F.least(
            F.col("pos") + window, F.size(F.col("toks"))
        ) - start + 1
        return first_pos.join(toks, "doc_id").select(
            "doc_id",
            F.array_join(F.slice(F.col("toks"), start, length), " ").alias(
                "snippet"
            ),
        )
