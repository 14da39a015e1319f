"""Differential fuzz for the post-cap text-ops tier — random documents
(word soup + valid AND near-miss PII-shaped tokens + repetition bursts
+ unicode/punctuation noise) run through the SAME dialect-paired SQL on
Spark (Java regex) and DuckDB (RE2), rows compared exactly.

The fixture-based semantic tests pin correctness on the shipped corpus;
this probes the regex-engine seam (word boundaries, quantifiers,
character classes, alternation order) on inputs the fixture never
produces.

Usage: python tools/fuzz_textops.py [n_docs=2000] [seed ...]
"""

from __future__ import annotations

import pathlib
import random
import sys

import duckdb

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["pii_scrub", "quality_repetition", "quality_sampling",
           "curation_pipeline", "decontam_13gram", "lang_id_heuristic",
           "quality_score", "token_stats", "doc_chunking",
           "sequence_packing",
           # web-graph / retrieval tier: boilerplate + bm25 exercise
           # the random text (line dedup, tf/df/top-k); link_graph
           # exercises the random doc_id set.  host_pagerank is pure
           # doc_id arithmetic over the same edges (already pinned by
           # dual-SF parity + Python recompute) — skipped here to keep
           # the fuzz wall bounded.
           "boilerplate_lines", "bm25_topk", "link_graph",
           # exact-substring dedup + CCNet terciles over the random
           # text (the repetition bursts create genuine within-doc
           # duplicated runs; PII/noise tokens stress tokenization)
           "dedup_substring", "ccnet_ppl_buckets",
           "c4_clean", "url_host_filter", "bpe_train_merges",
           # encode rides the same merge chain; random vocabs stress
           # tie order and the replace-padding scan on both engines
           "bpe_encode",
           # DSIR selection: all-'en' fuzz docs make target==raw
           # (every bucket weight exactly 1000) — degenerate scores,
           # but the md5 bucketing + tokenization seam is exercised
           "dsir_select",
           # unicode normalization: the curly/nbsp/control classes vs
           # the fuzz noise pool (naïve, ①②③, tab-sep) on both regex
           # engines
           "text_normalize",
           # CMS heavy hitters: the ~30-word fuzz vocab sits in the
           # same collision regime (W=16) as the fixture
           "cms_heavy_hitters",
           # tf-idf top-k: random tf/df collisions stress the integer
           # scoring + (score DESC, term) tie order on both engines;
           # robots/budget are doc_id arithmetic — random doc COUNTS
           # exercise rule-class membership + remainder ties
           "tfidf_keywords", "robots_filter", "crawl_budget",
           # politeness slots: random doc COUNTS exercise queue depth,
           # priority ties, and the horizon cut
           "politeness_schedule",
           # phrase adjacency over the random bigram stream (noise
           # tokens create unseen bigrams; repetition bursts create
           # high-count ties for the (n DESC, doc_id) order);
           # recrawl digests the random TEXT (md5 seam) under the
           # doc_id-derived change/gone/new classes; frontier/trust/
           # hits/rendezvous are doc_id arithmetic — random doc
           # COUNTS exercise class membership, graph shape, and the
           # movement matrix
           "phrase_search", "recrawl_schedule", "crawl_frontier",
           "trustrank_seeds", "hits_scores", "shard_rendezvous",
           # session-7 additions: MaxScore pruning exactness under
           # random tf/df; containment's shingle/minhash/md5 chain
           # over random text; mirror digests; trap-filter and
           # wildcard-robots regex seams (Java vs RE2); classifier
           # sparse dot; exact quantile ranks under duplicate counts
           "bm25_maxscore", "dedup_containment", "mirror_hosts",
           "url_trap_filter", "robots_wildcard_filter",
           "quality_classifier", "length_quantiles",
           # log-bucket sketch vs random length spectra (bucket-edge
           # values, rank ties, single-doc languages); the range
           # partitioner rides the same histogram with sub-buckets
           # (3-token fuzz docs hit the small-octave ceiling math)
           "quantile_sketch", "range_partition_plan",
           # PMI over random bigrams: repetition bursts create real
           # high-support collocations; count ties stress the top-k
           "pmi_collocations",
           # pointer doubling vs random doc_id sets (missing chain
           # targets exercise the dangling-301 LEFT-join class)
           "redirect_resolve",
           # SymSpell joins vs the random vocab (PII/noise tokens make
           # odd-shaped words; count ties hit the topv rank order)
           "spell_suggest",
           # CDC resync under random word streams (boundary density,
           # duplicate-chunk digests, twin intersections)
           "cdc_chunks",
           # triangle orientation vs random doc_id graphs (degree ties,
           # hub fan-out, empty-triangle hosts)
           "triangle_counts",
           # NEAR/k gaps under random co-occurrence + tf ties
           "proximity_search",
           # Manku banded simhash: random token vote sums stress the
           # 48-bit majority pack + bit_count/xor seam on both engines
           "simhash_hamming",
           # mojibake repair: the fuzz noise pool's non-ASCII tokens
           # (naïve, curly quotes) meet the replace chain + the
           # Ã/Â/â€ residual-detector regex on both engines
           "encoding_repair",
           # sentence segmentation: random punctuation + case mixes
           # stress the boundary class and the sentinel split on both
           # regex engines (the %3==2 branch runs the raw fuzz text);
           # markdown twin: the slug derivation (class-strip + space
           # collapse + trim) meets the fuzz noise pool
           "sentence_split", "html_to_markdown",
           # table grids are doc_id arithmetic — random doc COUNTS
           # exercise row-count classes and the multi-table branch
           "html_table_extract",
           # readability: random word/vowel/boundary densities stress
           # the three count regexes and the banded double math
           "readability_score",
           # closing-session tier, all documents-only: suffix-table
           # matching + og/twitter fallback + hreflang grids are
           # doc_id-arithmetic HTML synthesis (random doc COUNTS
           # exercise tier membership and join fan-out); KMV/Z-order/
           # reputation/LM/Rocchio digest the random TEXT (md5 seam,
           # tf ties, bigram backoff); snippets/outline/winnowing run
           # their window scans over the fuzz token stream; the
           # domain cap ranks md5 hashes; AMP pairing full-outer-joins
           # the declared url pairs
           "registered_domain", "opengraph_cards",
           "hreflang_alternates", "kmv_overlap", "zorder_cluster",
           "jsonld_extract", "host_reputation", "rocchio_expand",
           "bigram_lm_score", "domain_cap_sample",
           "amp_canonical_pairs", "search_snippets",
           "headings_outline", "winnow_matches",
           # magic-byte sniffing: pure doc_id arithmetic + the
           # anchored hex whitespace-skip regex on both engines
           "content_sniff",
           # reciprocity spam tiers: random doc_id sets vary the
           # organic graph shape and which farm members emit
           "link_spam_score",
           # min/max skipping: random n_chars spectra reshape the
           # Morton cells, file stats, and scan decisions
           "minmax_prune_stats",
           # bitext anchors: random PII/noise digit tokens join the
           # injected anchors and stress the df cap + reverse() seam
           "bitext_mine",
           # posting costing: random df spectra + gap patterns flip
           # the three-way winner; bin()/bit-length seam both engines
           "posting_compression",
           # soft-404: random length spectra move the host medians
           # and the half-median gate; phrase regex both engines
           "soft404_detect",
           # coverage reconciliation: random doc_id sets vary the
           # per-host gap/orphan classes and the full-outer fan
           "sitemap_gap",
           # content drift: random texts move simhash distances and
           # the per-host class mix / backoff tiers in both engines
           "content_drift",
           # BFS depth: random doc_id sets reshape the host graph and
           # the beyond-cap tier
           "crawl_depth",
           # BM25F: random token spectra move per-field tfs, df, and
           # the rational saturation / top-k ties on both engines
           "bm25f_fielded",
           # microdata: pure doc_id arithmetic HTML synthesis — random
           # doc COUNTS exercise the three value channels + fallback
           "microdata_extract",
           # OPIC: random doc_id sets reshape the cash flow graph,
           # dangling mass, and the fetch-order ties
           "opic_priority",
           # langseg: doc_id-arithmetic sentence synthesis — random
           # doc COUNTS exercise rotation phases and island shapes
           "langseg_spans",
           # hard negatives: random tf/df move the scored pool and
           # the anti-join/top-4 ties on both engines
           "hard_negatives",
           # template clustering: doc_id arithmetic synthesis — random
           # doc COUNTS reshape cluster sizes, share math, rank ties
           "template_cluster",
           # partition-plan costing: random df spectra flip the
           # doc/term winner and the shard-collision tiers
           "index_partition_plan",
           # revalidation: random texts/n_chars move the hash compare
           # and byte accounting through every tier
           "conditional_revalidate",
           # skip-grams: random token streams move window counts,
           # harmonic weights, min-count and top-k ties
           "skipgram_pairs"]

WORDS = ("the fast key order sort table scan merge part window small "
         "hash join batch value stream data group query row filter "
         "customer line big slow agg spark vector column").split()

PII_VALID = [
    "user{i}@example.com", "a.b-c_d+x@mail{i}.example.org",
    "(212) 555-01{i:02d}", "(212)555-01{i:02d}", "212-555-01{i:02d}",
    "123-45-67{i:02d}",
]
PII_NEARMISS = [
    "user@@example..com", "user@example", "@example.com", "user@.com",
    "(21) 555-0123", "212-555-012", "212-5550-123", "1234-55-6789",
    "123-456-78", "12-345-6789", "123--45-6789", "a@b.c",
    "(212) 555-01234",  # trailing extra digit
]
NOISE = ["$1,234.56", "...", "—", "naïve", "<tag>", "a&b", "50%",
         "e.g.", "x=y+1", "①②③", " spaced", "tab\tsep",
         # normalize-class stressors: curly quotes, nbsp, zero-width,
         # soft hyphen, en-dash range, ellipsis, control byte
         "\u201cquoted\u201d", "it\u2019s", "a\u00a0b", "z\u200bw",
         "so\u00adft", "1\u20132", "wait\u2026", "bel" + chr(7) + "l"]


def make_docs(n: int, rng: random.Random):
    docs = []
    for i in range(n):
        k = rng.randint(3, 80)
        toks = [rng.choice(WORDS) for _ in range(k)]
        if rng.random() < 0.3:   # repetition burst (Gopher territory)
            burst = [rng.choice(WORDS)] * rng.randint(2, 30)
            pos = rng.randint(0, len(toks))
            toks[pos:pos] = burst
        for pool, p in ((PII_VALID, 0.4), (PII_NEARMISS, 0.5),
                        (NOISE, 0.4)):
            if rng.random() < p:
                tok = rng.choice(pool).format(i=i % 100)
                toks.insert(rng.randint(0, len(toks)), tok)
        text = " ".join(toks)
        docs.append((i, text, "en", "fuzz", len(text)))
    return docs


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(
            repr(r[i]) if isinstance(r[i], float) else str(r[i])
            for i in order))
    return sorted(out), [cols[i] for i in order]


def main(n_docs="2000", *seeds):
    from pdf_parser_spark.session import get_spark
    from query_registry import QUERY_SQL

    n_docs = int(n_docs)
    seeds = [int(s) for s in seeds] or [0]
    spark = get_spark(app="fuzz-textops", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for seed in seeds:
        rng = random.Random(seed)
        docs = make_docs(n_docs, rng)
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, "
                  "source string, n_chars bigint"
        ).createOrReplaceTempView("documents")
        con = duckdb.connect()
        import pandas as pd
        con.register("documents", pd.DataFrame(
            docs, columns=["doc_id", "text", "lang", "source",
                           "n_chars"]))
        for name in QUERIES:
            sdf = spark.sql(QUERY_SQL[name]["spark"])
            s_rows, s_cols = norm(sdf.columns,
                                  [tuple(r) for r in sdf.collect()])
            dres = con.sql(QUERY_SQL[name]["duckdb"])
            d_rows, d_cols = norm(dres.columns, dres.fetchall())
            ok = s_cols == d_cols and s_rows == d_rows
            print("seed=%d %-20s %s  %d rows" %
                  (seed, name, "OK " if ok else "DIVERGE", len(s_rows)))
            if not ok:
                failures.append((seed, name))
                diffs = [(a, b) for a, b in zip(s_rows, d_rows)
                         if a != b][:3]
                for a, b in diffs:
                    print("  spark:", a)
                    print("  duck :", b)
    print("\n%d/%d (seed, query) runs agree" %
          (len(seeds) * len(QUERIES) - len(failures),
           len(seeds) * len(QUERIES)))
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:])
