#!/usr/bin/env python3
"""Per-round bench ledger: turn the BENCH_r*.json driver artifacts (and any
full local board dumps) into one committed BENCH_LEDGER.json so drift
questions ("is this round slower than it should be?") are answered by
lookup against per-query minima, not by argument from two adjacent rounds.

Driver artifacts only keep a 2000-char tail of the bench stdout, so early
rounds' boards are PARTIAL (alphabetically-early queries cut off); the
ledger records whatever survives plus the sentinels. Full boards come from
local runs saved as BENCH_LOCAL_r<N>.json (the raw one-line Bench JSON):
run  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
and save the {"metric":...} line.

Usage: python3 tools/bench_ledger.py          # rebuild BENCH_LEDGER.json
Dev tooling only — the engine itself is pure Scala/Spark.
"""
import glob
import json
import re
import os

QUERY_RE = re.compile(r'"(q_[a-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')
SENT_RE = re.compile(r'"sentinel_(first|last)_sec":([0-9]+(?:\.[0-9]+)?)')


def parse_tail(tail):
    """All "q_name":sec pairs + sentinels surviving in a truncated tail."""
    qs = {m.group(1): float(m.group(2)) for m in QUERY_RE.finditer(tail)}
    sent = {f"sentinel_{m.group(1)}_sec": float(m.group(2))
            for m in SENT_RE.finditer(tail)}
    return qs, sent


def main():
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    rounds = {}
    for path in sorted(glob.glob("BENCH_r*.json")):
        rn = int(re.search(r"BENCH_r(\d+)\.json", path).group(1))
        d = json.load(open(path))
        qs, sent = parse_tail(d.get("tail", ""))
        rounds[rn] = {
            "source": "driver_tail",
            "rc": d.get("rc"),
            "sf": d.get("sf"),
            "complete": False,  # tail truncation loses the board's head
            "n_queries": len(qs),
            **sent,
            "queries": qs,
        }
    # full local boards override the truncated driver view for their round
    for path in sorted(glob.glob("BENCH_LOCAL_r*.json")):
        rn = int(re.search(r"BENCH_LOCAL_r(\d+)\.json", path).group(1))
        d = json.load(open(path))
        qs = d.get("queries", {})
        rounds[rn] = {
            "source": "local_full",
            "rc": 0,
            "sf": 0.1 if "sf0.1" in str(d.get("sf", "")) else d.get("sf"),
            "complete": True,
            "n_queries": len(qs),
            "sentinel_first_sec": d.get("sentinel_first_sec"),
            "sentinel_last_sec": d.get("sentinel_last_sec"),
            "queries": qs,
        }
    # sentinel mean per round: the host-speed yardstick (a fixed trivial
    # job timed by Bench before warm-up and after the last pass). Two
    # rounds of uniform host drift (r17 +8.6%, r18 +25% geomean on rows
    # whose source never changed, with 1.5-5.4% hypervisor STEAL
    # profiled) made RAW cross-round ratios stop detecting real
    # regressions — so every round also records its queries divided by
    # its own sentinel mean, and the regression view below quotes the
    # NORMALIZED geomean first (VERDICT r18 item 4).
    for rec in rounds.values():
        sf_, sl_ = rec.get("sentinel_first_sec"), rec.get("sentinel_last_sec")
        sm = None
        if sf_ and sl_:
            sm = (sf_ + sl_) / 2.0
        elif sf_ or sl_:
            sm = sf_ or sl_
        rec["sentinel_mean_sec"] = sm

    # per-query minimum over valid sf0.1 rounds — the drift reference.
    # Raw minima are host-speed-entangled; the normalized minima divide
    # by each round's sentinel mean (sentinel-relative cost — stable
    # across host drift, noisier on sub-sentinel rows).
    minima, minima_norm = {}, {}
    for rn, rec in rounds.items():
        if rec["rc"] != 0:
            continue
        sm = rec.get("sentinel_mean_sec")
        for q, sec in rec["queries"].items():
            cur = minima.get(q)
            if cur is None or sec < cur["sec"]:
                minima[q] = {"sec": sec, "round": rn,
                             "sentinel_first_sec": rec.get("sentinel_first_sec"),
                             "sentinel_last_sec": rec.get("sentinel_last_sec")}
            if sm:
                curn = minima_norm.get(q)
                if curn is None or sec / sm < curn["x_sentinel"]:
                    minima_norm[q] = {"x_sentinel": round(sec / sm, 3),
                                      "round": rn}
    # round-over-round ratios between the last two COMPLETE boards,
    # computed ONCE — both the committed flag_regression field and the
    # printed drift views below derive from this table, so a threshold
    # tweak can never drift the shipped flag away from the human view.
    full = [rn for rn in sorted(rounds) if rounds[rn].get("complete")
            and rounds[rn].get("sentinel_mean_sec")]
    pair_ratios = {}  # q -> {raw_x, norm_x, prev_sec, sec}
    if len(full) >= 2:
        a, b = full[-2], full[-1]
        ra, rb = rounds[a], rounds[b]
        sma, smb = ra["sentinel_mean_sec"], rb["sentinel_mean_sec"]
        for q in sorted(set(ra["queries"]) & set(rb["queries"])):
            pair_ratios[q] = {
                "raw_x": rb["queries"][q] / ra["queries"][q],
                "norm_x": (rb["queries"][q] / smb) / (ra["queries"][q] / sma),
                "prev_sec": ra["queries"][q], "sec": rb["queries"][q]}

    # dual-metric regression flag (§24.5, VERDICT r19 item 5), shipped
    # in the ledger: a row on the latest complete board is flagged only
    # when its raw AND its sentinel-normalized round-over-round ratios
    # BOTH exceed 1.3x — raw-only moves are host drift, normalized-only
    # moves are sentinel noise on sub-sentinel rows. A row is exempt
    # only when BOTH rounds are sub-noise (<=0.05s) — a cheap row
    # regressing into seconds still has sec > 0.05 and IS flagged; the
    # exempt count is recorded so exclusions are never silent.
    if len(full) >= 2:
        b = full[-1]
        flags, exempt = {}, 0
        for q, r in pair_ratios.items():
            if r["prev_sec"] <= 0.05 and r["sec"] <= 0.05:
                exempt += 1  # both legs in timer noise: ratio meaningless
                continue
            if r["raw_x"] > 1.3 and r["norm_x"] > 1.3:
                flags[q] = {"raw_x": round(r["raw_x"], 3),
                            "norm_x": round(r["norm_x"], 3),
                            "prev_sec": r["prev_sec"], "sec": r["sec"],
                            "vs_round": full[-2]}
        rounds[b]["flag_regression"] = flags
        rounds[b]["flag_regression_exempt_subnoise_rows"] = exempt

    out = {"rounds": {str(k): rounds[k] for k in sorted(rounds)},
           "per_query_min": dict(sorted(minima.items())),
           "per_query_min_x_sentinel": dict(sorted(minima_norm.items()))}
    with open("BENCH_LEDGER.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"ledger: {len(rounds)} rounds, {len(minima)} queries with minima")
    if len(full) >= 2:
        b = full[-1]
        fl = rounds[b].get("flag_regression", {})
        if fl:
            for q, d in sorted(fl.items()):
                print(f"  FLAG_REGRESSION r{b} {q}: raw {d['raw_x']}x / "
                      f"norm {d['norm_x']}x ({d['prev_sec']:.2f}s -> {d['sec']:.2f}s)")
        else:
            print(f"  r{b}: flag_regression EMPTY "
                  f"(no row with raw AND normalized ratios both >1.3x; "
                  f"{rounds[b]['flag_regression_exempt_subnoise_rows']} "
                  f"sub-noise rows exempt)")
    # headline drift view: latest valid round vs ledger min
    valid = [rn for rn, r in rounds.items() if r["rc"] == 0]
    if valid:
        last = max(valid)
        worst = []
        for q, sec in rounds[last]["queries"].items():
            m = minima[q]["sec"]
            if m > 0.05 and sec > 1.5 * m:
                worst.append((sec / m, q, sec, m, minima[q]["round"]))
        for ratio, q, sec, m, rn in sorted(worst, reverse=True)[:15]:
            print(f"  r{last} {q}: {sec:.2f}s = {ratio:.2f}x ledger min "
                  f"{m:.2f}s (r{rn})")
        if not worst:
            print(f"  r{last}: no query >1.5x its ledger minimum")
    # round-over-round view, NORMALIZED first: geomeans + the norm-only
    # hot list — derived from the SAME pair_ratios table that computed
    # the shipped flag_regression field (one computation, two views).
    import math
    if pair_ratios:
        a, b = full[-2], full[-1]
        sma = rounds[a]["sentinel_mean_sec"]
        smb = rounds[b]["sentinel_mean_sec"]
        gm = lambda xs: math.exp(sum(math.log(x) for x in xs) / len(xs))
        raw = [r["raw_x"] for r in pair_ratios.values()]
        nrm = [r["norm_x"] for r in pair_ratios.values()]
        print(f"  r{a}->r{b} ({len(pair_ratios)} common rows): "
              f"sentinel-normalized geomean {gm(nrm):.3f}x "
              f"(raw {gm(raw):.3f}x; sentinel mean "
              f"{sma:.3f}s -> {smb:.3f}s)")
        # SAME sub-noise exemption as the shipped flag (both legs
        # <=0.05s) — a cheap row regressing into real time appears in
        # BOTH the ledger flag and this printed view, never just one
        hot = [(r["norm_x"], q) for q, r in pair_ratios.items()
               if r["norm_x"] > 1.3
               and not (r["prev_sec"] <= 0.05 and r["sec"] <= 0.05)]
        for rx, q in sorted(hot, reverse=True)[:15]:
            r = pair_ratios[q]
            print(f"    NORM>1.3x {q}: {rx:.2f}x "
                  f"({r['prev_sec']:.2f}s -> {r['sec']:.2f}s)")
        if not hot:
            print(f"    no row >1.3x sentinel-normalized")


if __name__ == "__main__":
    main()
