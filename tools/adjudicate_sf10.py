#!/usr/bin/env python3
"""Build the SURVEY second-decade adjudication table from the round-12
full-surface sf1/sf10 bench artifacts (BENCH_sf1_r12.json /
BENCH_sf10_r12.json). Each key's best-of-3 sf1 -> sf10 ratio is graded
against its declared scaling band:

  probe   - persisted-index probe or fixed-size serving frame: declared
            FLAT per decade (band <= 3x; index build cost shows in run 1,
            "queries" reports steady-state min).
  sketch  - constant-space mergeable sketch / bounded key-space agg:
            declared flat-to-sublinear (band <= 3x).
  sublin  - vocabulary/key-space-bounded work over a corpus-sized scan
            whose reduced frame grows sublinearly (band <= 6x).
  linear  - one-or-more full corpus passes, per-row work dominates:
            declared at-or-under LINEAR (band <= 12x: 10x data plus
            run-to-run variance; anything above needs a named cause).

Emits a markdown table (stdout) sorted family-major, plus a summary of
out-of-band keys. The table is pasted into SURVEY.md section 4 and the
out-of-band keys adjudicated by hand there.
"""
import json, sys, collections

sf1 = json.load(open("BENCH_sf1_r12.json"))
sf10 = json.load(open("BENCH_sf10_r12.json"))

BANDS = {"probe": 3.0, "sketch": 3.0, "sublin": 6.0, "linear": 12.0}

# Declared band per key. Default: linear (a corpus pass). Overrides:
PROBE = {
    # lexical search surface: every query probes the per-snapshot
    # TextIndex posting/dictionary frames; serving frames are k-row
    "search_filter", "search_filter_functions", "search_orderby_page",
    "search_facets", "search_ismatch", "search_ismatch_path",
    "search_score", "search_ismatch_terms", "search_score_bm25",
    "search_hybrid_rrf", "search_suggest", "search_highlight",
    "search_fuzzy", "search_fuzzy_jw", "search_phrase",
    "search_phrase_slop", "search_boolean", "search_more_like_this",
    "search_multifield", "search_multiquery", "search_bm25_persisted",
    # ANN serving: IVF cell-pruned probes over the written layout
    # (NOT ann_bruteforce/int8/pq/lsh_bucket/recall — those scan the
    # corpus by design and grade against the linear band)
    "ann_ivf", "ann_ivf_persisted", "ann_ivfpq",
    "ann_multiquery", "ann_filtered", "ann_range",
    "ann_incremental",
    # dedup serving probes over the persisted/cached band index
    "dedup_lookup_persisted", "dedup_incremental", "dedup_embedding",
    "dedup_clusters", "dedup_threshold_sweep",
    "dedup_soft_weights", "dedup_minhash_lsh",
    # incremental/delta paths: the delta is fixed-size, not corpus-size
    "search_incremental", "join_incremental",
    "agg_incremental", "stream_bitmap", "layout_compaction",
    "join_bucketed",
}
SKETCH = {
    "events_hll", "events_hll_rolling", "events_cms",
    "events_quantile_sketch", "events_kmv_overlap", "events_kmv_diff",
    "events_bitmap_distinct", "events_bitmap_rolling",
    "text_heavy_hitters",
}
SUBLIN = {
    # distinct-signature / vocabulary-bounded reduced frames
    "dedup_simhash", "dedup_simhash_pairs", "dedup_minhash_est",
    "dedup_semdedup", "dedup_ngram_jaccard", "dedup_containment",
    "text_ccnet_buckets", "text_tokens", "sample_token_budget",
    "bpe_train_step", "text_bigram_logprob", "text_unigram_logprob",
    "embed_pca", "embed_pca_topk", "embed_abtt", "graph_pagerank",
    "link_part_names",
}

def band_of(k):
    if k in PROBE: return "probe"
    if k in SKETCH: return "sketch"
    if k in SUBLIN: return "sublin"
    return "linear"

rows = []
for k in sorted(sf10["queries"]):
    a, b = sf1["queries"].get(k, -1.0), sf10["queries"][k]
    band = band_of(k)
    if a is None or a <= 0 or b is None or b < 0:
        rows.append((k, a, b, None, band, "ERR"))
        continue
    # sub-0.15s sf1 points are timer noise; grade those on the sf10
    # absolute instead (flat probes stay sub-second at sf10)
    if a < 0.15:
        ok = b <= max(1.0, BANDS[band] * max(a, 0.05))
        rows.append((k, a, b, b / a, band, "ok" if ok else "OUT"))
        continue
    r = b / a
    rows.append((k, a, b, r, band, "ok" if r <= BANDS[band] else "OUT"))

out = [r for r in rows if r[5] != "ok"]
print(f"| key | band | sf1 s | sf10 s | ratio | verdict |")
print(f"| --- | --- | --- | --- | --- | --- |")
for k, a, b, r, band, v in rows:
    rs = f"{r:.1f}x" if r is not None else "-"
    print(f"| `{k}` | {band} | {a:.2f} | {b:.2f} | {rs} | {v} |")
print()
print(f"total sf1 {sf1['value']:.1f}s  sf10 {sf10['value']:.1f}s  "
      f"ratio {sf10['value']/sf1['value']:.2f}x  "
      f"errors sf1={sf1['errors']} sf10={sf10['errors']}")
print(f"out-of-band ({len(out)}):")
for k, a, b, r, band, v in out:
    print(f"  {k}: {band} {a:.2f}->{b:.2f} ({(r or 0):.1f}x)")
