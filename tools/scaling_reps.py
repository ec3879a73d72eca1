"""Repeat the two-parallelism scaling measurement (north-rule evidence)
without re-running the headline bench: materialize the xlarge web once,
then alternate cold-JVM crawl subprocesses at the small/big level, with a
same-session pure-CPU control per rep. Prints one JSON line per rep pair."""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import bench

SMALL, BIG = (int(x) for x in
              os.environ.get("SPARK_GRAFT_SCALING_CPUS", "1,4").split(","))
N_REPS = int(os.environ.get("REPS", "2"))
SIZE = os.environ.get("SPARK_GRAFT_SCALING_SIZE", "xlarge")

web_dir = tempfile.mkdtemp(prefix="scalrep_web_")
try:
    from spider_spark.session import get_spark

    gen = get_spark(app="webgen", master="local[16]", shuffle_partitions=16)
    bench.materialize_web(gen, SIZE, web_dir + "/docs")
    gen.stop()
    for rep in range(N_REPS):
        # control measured immediately BEFORE each level: on a shared VM
        # the load can change between the two subprocess runs of a pair,
        # so a single after-the-fact control mis-normalizes whichever
        # level ran under different conditions
        ctrl_small = bench._cpu_control(SMALL)
        res_small = bench.crawl_subprocess(SMALL, SIZE, web_dir + "/docs")
        ctrl_big = bench._cpu_control(BIG)
        res_big = bench.crawl_subprocess(BIG, SIZE, web_dir + "/docs")
        speedup = res_big["urls_per_sec"] / res_small["urls_per_sec"]
        eff = speedup / (BIG / SMALL)
        ctrl_eff = (ctrl_small / ctrl_big) / (BIG / SMALL)
        print(json.dumps({
            "rep": rep, "pair": [SMALL, BIG], "size": SIZE,
            "sec_small": res_small["crawl_round_sec"],
            "sec_big": res_big["crawl_round_sec"],
            "urls_small": res_small["urls_per_sec"],
            "urls_big": res_big["urls_per_sec"],
            "ctrl_sec_small": round(ctrl_small, 1),
            "ctrl_sec_big": round(ctrl_big, 1),
            "eff": round(eff, 3),
            "ctrl_eff": round(ctrl_eff, 3),
            "eff_vs_ctrl": round(min(eff / ctrl_eff, 1.0), 3),
        }), flush=True)
finally:
    shutil.rmtree(web_dir, ignore_errors=True)
