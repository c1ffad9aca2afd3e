#!/usr/bin/env python3
"""Build the SURVEY scale-adjudication table from full-surface bench
artifacts. Round-14 form: grades BOTH decades (sf0.1->sf1 and
sf1->sf10, r13 verdict #3 — two first-decade anomalies went ungraded in
r13 because only the second decade was banded), and the per-key band
declarations live IN THE SCALA REGISTRY (QueryPack.bands, next to each
key's binding — r13 verdict #4's single source of truth), exported by
`runMain graft.ListKeys bands` into a TSV this script consumes. The
python band dicts this file carried through r13 are deleted; a band
change is now a Scala code-review diff.

Band semantics (per decade, 10x data):
  probe   - persisted-index probe or fixed-size serving frame: FLAT
            (<= 3x; plus an absolute pass: sf10-point <= 2.5s,
            ratio-bounded at the linear band).
  sketch  - constant-STATE mergeable sketch: state/mergeability is the
            claim (spec-proven); TIME is one linear corpus pass, so the
            time band equals linear (<= 12x).
  sublin  - vocabulary/key-space-bounded reduced-frame work: <= 6x.
  linear  - one-or-more full corpus passes: <= 12x (10x data plus
            run-to-run variance); anything above needs a named cause.

usage: adjudicate_sf10.py [BENCH_sf1.json] [BENCH_sf10.json]
                          [bands.tsv] [BENCH_sf0.1.json]
The fourth arg (a quiet sf0.1 full-surface artifact) enables the
first-decade column; without it only sf1->sf10 is graded.
"""
import json, sys

sf1 = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_r14.json"))
sf10 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10_r14.json"))
bands_path = sys.argv[3] if len(sys.argv) > 3 else "tools/bands.tsv"
sf01 = json.load(open(sys.argv[4])) if len(sys.argv) > 4 else None

BANDS = {"probe": 3.0, "sketch": 12.0, "sublin": 6.0, "linear": 12.0}
band_of = {}
for line in open(bands_path):
    k, b = line.split()
    if b not in BANDS:
        sys.exit(f"{bands_path}: illegal band '{b}' for {k}")
    band_of[k] = b
missing = set(sf10["queries"]) - set(band_of)
if missing:
    sys.exit(f"{bands_path}: no band for keys {sorted(missing)} — "
             "regenerate with `sbt 'runMain graft.ListKeys bands'`")


def grade(a, b, band):
    """Return (ratio, verdict) for one decade a->b under `band`.

    Small-absolute floors (round-12 advice): an absolute pass may only
    absorb timer noise and per-query constants, never mask genuine
    super-linear growth, so every absolute pass is RATIO-BOUNDED at the
    linear band (12x). Two absolute rules:
     - probes: decade-top point <= 2.5s (serving-path flat regardless
       of band-ratio noise against a sub-second lower point);
     - ANY band with the lower point under the 0.15s timer-noise floor:
       the ratio is unmeasurable, grade on the upper absolute alone.
    """
    if a is None or a <= 0 or b is None or b < 0:
        return None, "ERR"
    r = b / a
    if a < 0.15:
        return r, ("ok" if b <= 2.5 else "OUT")
    if band == "probe" and b <= 2.5 and r <= BANDS["linear"]:
        return r, "ok"
    return r, ("ok" if r <= BANDS[band] else "OUT")


rows = []
for k in sorted(sf10["queries"]):
    band = band_of[k]
    a, b = sf1["queries"].get(k, -1.0), sf10["queries"][k]
    r2, v2 = grade(a, b, band)
    if sf01 is not None:
        z = sf01["queries"].get(k, -1.0)
        r1, v1 = grade(z, a, band)
    else:
        z, r1, v1 = None, None, "-"
    rows.append((k, band, z, a, b, r1, v1, r2, v2))

# ERR counts as not-certified (round-15 advice): a key missing from an
# artifact or carrying a negative (failed-run) timing must surface in
# the out-of-band summary, not silently grade as in-band.
out = [r for r in rows if r[6] in ("OUT", "ERR") or r[8] in ("OUT", "ERR")]


def f(x, fmt="{:.2f}"):
    return fmt.format(x) if x is not None else "-"


hdr = ("| key | band | sf0.1 s | sf1 s | sf10 s | dec1 | v1 | dec2 | v2 |"
       if sf01 is not None else
       "| key | band | sf1 s | sf10 s | ratio | verdict |")
print(hdr)
print("| --- " * (hdr.count("|") - 1) + "|")
for k, band, z, a, b, r1, v1, r2, v2 in rows:
    if sf01 is not None:
        print(f"| `{k}` | {band} | {f(z)} | {f(a)} | {f(b)} | "
              f"{f(r1, '{:.1f}x')} | {v1} | {f(r2, '{:.1f}x')} | {v2} |")
    else:
        print(f"| `{k}` | {band} | {f(a)} | {f(b)} | {f(r2, '{:.1f}x')} | {v2} |")
print()
print(f"total sf1 {sf1['value']:.1f}s  sf10 {sf10['value']:.1f}s  "
      f"ratio {sf10['value']/sf1['value']:.2f}x  "
      f"errors sf1={sf1['errors']} sf10={sf10['errors']}")
if sf01 is not None:
    print(f"sf0.1 total {sf01['value']:.1f}s  "
          f"first-decade ratio {sf1['value']/sf01['value']:.2f}x")
print(f"out-of-band ({len(out)}):")
for k, band, z, a, b, r1, v1, r2, v2 in out:
    which = []
    if v1 in ("OUT", "ERR"):
        which.append(f"dec1 {f(z)}->{f(a)} ({f(r1, '{:.1f}x')} {v1})")
    if v2 in ("OUT", "ERR"):
        which.append(f"dec2 {f(a)}->{f(b)} ({f(r2, '{:.1f}x')} {v2})")
    print(f"  {k}: {band} " + "; ".join(which))
