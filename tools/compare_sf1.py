#!/usr/bin/env python3
"""Full-surface sf1 correctness gate (round-16 verdict task 1).

Same hash discipline as tools/compare.py (DuckDB oracle over the sfDir
tables, sorted-column/sorted-row exact string compare against the Verify
parquet dump), plus what a 10x-data sweep needs:

  * each oracle runs in its OWN subprocess with a wall-clock timeout —
    a pair-population-bound oracle that explodes at sf1 is killed and
    recorded as TIMEOUT (candidate for the justified exclusion list),
    never hangs the gate;
  * results stream into a JSON artifact (per-query status + seconds),
    so a killed run keeps everything already measured; a resumed run
    re-queues every non-PASS entry (fail/timeout/error retry after a
    fix — only passes are cached);
  * --jobs N runs queries in parallel worker processes;
  * memory-heavy oracles (q248's |V|^2-pair window) run LAST and SOLO
    with DuckDB spill enabled (memory_limit + temp_directory) — the
    whole gate is one command, no hand-run recipe step.

Usage:
    python3 tools/compare_sf1.py <sfDir> <outDir> <resultJson>
        [--timeout SEC] [--jobs N] [--only q1,q2,...]
"""
import json, math, multiprocessing as mp, os, sys, time


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out), [cols[i] for i in idx]


def run_one(sf_dir, out_dir, name, sql, q, heavy=False):
    import duckdb
    t0 = time.time()
    try:
        con = duckdb.connect()
        if heavy:
            # the q248 recipe (PLANS.md round 16): a pair-population-bound
            # oracle (|V|^2 = 4e8 cosine pairs at sf1) OOM-dies under the
            # shared worker budget but passes solo once DuckDB may spill
            # its window to disk
            # limit/spill-dir configurable (r17 advice): default the memory
            # limit to ~half of detected RAM so a smaller host spills
            # instead of OOMing the machine, and let both be overridden
            # via env (DUCK_MEM_LIMIT / DUCK_SPILL_DIR)
            mem = os.environ.get("DUCK_MEM_LIMIT")
            if not mem:
                try:
                    kb = int(next(l for l in open("/proc/meminfo")
                                  if l.startswith("MemTotal")).split()[1])
                    mem = f"{max(4, kb // 1024 // 1024 // 2)}GB"
                except Exception:
                    mem = "8GB"
            spill = os.environ.get("DUCK_SPILL_DIR", "/tmp/duck_spill")
            con.execute(f"SET memory_limit='{mem}'")
            os.makedirs(spill, exist_ok=True)
            con.execute(f"SET temp_directory='{spill}'")
        for tbl in ["region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents",
                    "embeddings"]:
            path = f"{sf_dir}/{tbl}.parquet"
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{src}'")
        want = con.execute(sql)
        wcols = [d[0] for d in want.description]
        wrows = want.fetchall()
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        wr, wc = canon(wrows, wcols)
        gr, gc = canon(grows, gcols)
        if wc != gc:
            q.put((name, "fail", f"cols spark={gc} oracle={wc}",
                   time.time() - t0))
        elif len(wr) != len(gr):
            q.put((name, "fail",
                   f"rows spark={len(gr)} oracle={len(wr)}",
                   time.time() - t0))
        elif wr != gr:
            bad = [(a, b) for a, b in zip(gr, wr) if a != b][:2]
            q.put((name, "fail", f"values differ: {str(bad)[:300]}",
                   time.time() - t0))
        else:
            q.put((name, "pass", f"{len(gr)} rows", time.time() - t0))
    except Exception as e:
        q.put((name, "error", f"{type(e).__name__}: {str(e)[:200]}",
               time.time() - t0))


def main(argv):
    sf_dir, out_dir, result_json = argv[0], argv[1], argv[2]
    timeout = 900.0
    jobs = 4
    only = None
    i = 3
    while i < len(argv):
        if argv[i] == "--timeout":
            timeout = float(argv[i + 1]); i += 2
        elif argv[i] == "--jobs":
            jobs = int(argv[i + 1]); i += 2
        elif argv[i] == "--only":
            only = set(argv[i + 1].split(",")); i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracle
                   if (only is None or n in only)
                   and os.path.exists(f"{out_dir}/{n}"))
    missing = sorted(n for n in oracle
                     if (only is None or n in only)
                     and not os.path.exists(f"{out_dir}/{n}"))
    results = {}
    if os.path.exists(result_json):
        results = json.load(open(result_json)).get("queries", {})
    # resume re-queues anything that is not a PASS: fail/timeout/error
    # entries retry after a fix instead of reporting stale failures
    # forever (round-16 advice — the old `n not in results` skip)
    pend = [n for n in names
            if results.get(n, {}).get("status") != "pass"]
    # memory-heavy oracles run LAST and SOLO with the spill config (the
    # one-command sf1 gate: no hand-run recipe step) — deferred so they
    # never share the worker budget with the rest of the sweep
    heavy_set = {"q248_mutual_nn"}
    heavy_pend = [n for n in pend if n in heavy_set]
    pend = [n for n in pend if n not in heavy_set]
    for n in missing:
        results[n] = {"status": "no_dump", "detail": "Verify wrote no "
                      "parquet for this query at sf1", "sec": 0.0}

    def flush():
        counts = {}
        for v in results.values():
            counts[v["status"]] = counts.get(v["status"], 0) + 1
        json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                   "timeout_sec": timeout, "counts": counts,
                   "queries": results},
                  open(result_json, "w"), indent=1, sort_keys=True)

    def sweep(queued, max_jobs, heavy, t_out):
        running = {}  # name -> (proc, queue, deadline)
        while queued or running:
            while queued and len(running) < max_jobs:
                n = queued.pop(0)
                q = mp.Queue()
                p = mp.Process(target=run_one,
                               args=(sf_dir, out_dir, n, oracle[n], q,
                                     heavy))
                p.start()
                running[n] = (p, q, time.time() + t_out)
            time.sleep(0.3)
            for n in list(running):
                p, q, dl = running[n]
                if not q.empty():
                    _, status, detail, sec = q.get()
                    results[n] = {"status": status, "detail": detail,
                                  "sec": round(sec, 1)}
                    p.join(5)
                    del running[n]
                    print(f"{status.upper()} {n} ({results[n]['sec']}s): "
                          f"{detail[:120]}", flush=True)
                    flush()
                elif not p.is_alive():
                    results[n] = {"status": "error",
                                  "detail": "oracle subprocess died "
                                  "(likely OOM-killed)", "sec": t_out}
                    del running[n]
                    print(f"ERROR {n}: subprocess died", flush=True)
                    flush()
                elif time.time() > dl:
                    p.terminate()
                    p.join(5)
                    if p.is_alive():
                        p.kill()
                    results[n] = {"status": "timeout",
                                  "detail": f"oracle exceeded {t_out}s",
                                  "sec": t_out}
                    del running[n]
                    print(f"TIMEOUT {n}", flush=True)
                    flush()

    sweep(pend, jobs, False, timeout)
    # q248's solo pass measured 156 s at sf1; give the heavy phase its
    # own floor so a tight --timeout for the main sweep can't kill it
    sweep(heavy_pend, 1, True, max(timeout, 600.0))
    flush()
    counts = {}
    for v in results.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print(f"== {counts} ==")
    return 0 if set(counts) <= {"pass", "timeout"} else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
