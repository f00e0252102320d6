#!/usr/bin/env python3
"""Compare one or more Bench JSON lines against BASELINE.md's canonical
round-16 pin table (driver-side tooling only, not part of the shipped
library).

Usage: python3 tools/compare_bench.py bench1.json [bench2.json ...]

Takes the per-query MIN across the given runs (the BASELINE.md protocol
for this noisy shared VM), prints every query above 2x its pin and the
unpinned queries.
"""
import json
import re
import sys


def load_pins() -> dict:
    txt = open("BASELINE.md").read()
    # anchor on the FIRST pin section header: newest sections sit above
    # older ones in the file, and "earliest row wins" below keeps a
    # newer re-pin from being overridden by an older row of the same name
    sec = txt.split("quiet pair + new-gate pins", 1)[1]
    # stop before the first SUPERSEDED historical table: its rows come
    # from retired hosts/protocols, and a query that a future re-base
    # drops from the live sections must surface as UNPINNED, not
    # silently resurrect a years-old pin
    sec = sec.split("SUPERSEDED")[0]
    pins = {}
    for line in sec.splitlines():
        # 2-cell rows (| query | pin |) and wider ones (| query | r3 |
        # r4 | pin |): the LAST numeric column is the pin
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|(?:.*\|)?\s*([0-9.]+)\s*\|\s*$",
                     line)
        if m:
            # EARLIEST section wins: the round-17 table precedes the
            # round-16 one in the slice, so an r17 re-pin must not be
            # silently overridden by the older row of the same name
            pins.setdefault(m.group(1), float(m.group(2)))
    return pins


def main():
    pins = load_pins()
    runs = []
    for f in sys.argv[1:]:
        line = open(f).read()
        runs.append(json.loads(line[line.find('{'):]))
    queries = {}
    for r in runs:
        for q, t in r["queries"].items():
            queries[q] = min(queries.get(q, float("inf")), t)
    print(f"pins: {len(pins)}  queries: {len(queries)}  runs: {len(runs)}")
    print(f"run totals: {[round(r['value'], 1) for r in runs]}")
    print(f"min-sum: {round(sum(queries.values()), 1)}  "
          f"pin-sum: {round(sum(pins.values()), 1)}")
    # host-context markers (Bench emits per-query [load1m, calib] since
    # round 7): a breach whose calib micro-task drifted >2x the run's
    # floor ran inside a contended window -> host noise, not regression
    host = {}
    floor = float("inf")
    dfloor = float("inf")
    for r in runs:
        for q, lc in r.get("host", {}).items():
            host.setdefault(q, lc)
        floor = min(floor, r.get("calib_floor", float("inf")))
        dfloor = min(dfloor, r.get("disk_floor", float("inf")))
    bad = [(q, round(t, 2), pins[q], round(t / pins[q], 1))
           for q, t in sorted(queries.items())
           if q in pins and t > 2 * pins[q]]
    unexplained = 0
    print(f"rows >2x pin: {len(bad)}")
    for q, t, p, r in bad:
        note = ""
        if q in host and floor < float("inf"):
            load, calib = host[q][0], host[q][1]
            # r8: a third element is the TRAILING calib sample — a wave
            # landing mid-query drifts it even when the leading probe
            # was clean
            after = host[q][2] if len(host[q]) > 2 else calib
            # r11: elements 4/5 are leading/trailing DISK probes
            # (create+fsync+delete on the streaming-WAL volume) — the
            # CPU calib is blind to disk waves, which hit the
            # longest-running streaming rows hardest. tmpfs fsyncs are
            # microseconds, so drift needs 4x the floor AND >= 10 ms.
            disks = host[q][3:5] if len(host[q]) > 4 else []
            disk_hit = dfloor < float("inf") and any(
                d > max(4 * dfloor, 0.010) for d in disks)
            dnote = (f", disk {'/'.join(str(d) for d in disks)}s vs "
                     f"floor {round(dfloor, 4)}s") if disks else ""
            if calib > 2 * floor or after > 2 * floor or disk_hit:
                kind = "disk-contended" if (disk_hit and calib <= 2 * floor
                                            and after <= 2 * floor) \
                    else "contended window"
                note = (f"  [{kind}: calib {calib}/{after}s vs "
                        f"floor {round(floor, 3)}s{dnote}, load {load}]")
            else:
                note = (f"  [UNEXPLAINED: calib {calib}/{after}s ~ floor"
                        f"{dnote}, load {load}]")
                unexplained += 1
        print(f"  {q}: {t}s vs pin {p}s ({r}x){note}")
    if bad and host:
        print(f"unexplained breaches: {unexplained} of {len(bad)}")
    ratios = sorted(t / pins[q] for q, t in queries.items() if q in pins)
    print(f"median ratio: {round(ratios[len(ratios) // 2], 2)}")
    unpinned = [q for q in queries if q not in pins]
    if unpinned:
        print("UNPINNED:", {q: round(queries[q], 2) for q in unpinned})


if __name__ == "__main__":
    main()
