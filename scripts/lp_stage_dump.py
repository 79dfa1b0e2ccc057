"""Diagnostic: run the minhash twin once at sf1 under the 8g session
default and dump EVERY stage of the measured pass -- id, task count,
name, input/shuffle bytes, spills, peak execution memory -- so the
near-cliff 32-way stages can be identified by measurement instead of
guessed (r13 width investigation).  Args: <cand_width> <dedup_width>.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hq_master_data_warehouse_spark import registry  # noqa: E402
from hq_master_data_warehouse_spark.session import get_spark  # noqa: E402
from hq_master_data_warehouse_spark.operators import graph  # noqa: E402

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".data",
    "sf1",
)


def main() -> None:
    graph.LP_CAND_PARTITIONS = int(sys.argv[1])
    graph.LINKPRED_AGG_PARTITIONS = int(sys.argv[2]) * 4
    registry.load_catalog()
    spark = get_spark(
        master="local[32]", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def stages():
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
        with urllib.request.urlopen(url, timeout=30) as r:
            return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}

    graph._copurchase_und(spark, SF1).count()
    df = graph.graph_link_prediction_minhash(spark, SF1)
    before = set(stages())
    t0 = time.perf_counter()
    err = None
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception as e:  # dump completed stages even on OOM
        err = repr(e)[:200]
    dt = time.perf_counter() - t0
    if err:
        print("FAILED:", err, flush=True)
    new = sorted(
        (s for k, s in stages().items() if k not in before),
        key=lambda s: s["stageId"],
    )
    mb = lambda v: round(v / 2**20, 1)  # noqa: E731
    print(f"wall={dt:.1f}s  (cold pass, cand={sys.argv[1]} dedup={sys.argv[2]})")
    print(
        "stage tasks  input_MB shufR_MB shufW_MB memSpill_MB "
        "diskSpill_MB peakExecMem_MB  name"
    )
    for s in new:
        print(
            f"{s['stageId']:>5} {s['numTasks']:>5} "
            f"{mb(s.get('inputBytes', 0)):>9} "
            f"{mb(s.get('shuffleReadBytes', 0)):>8} "
            f"{mb(s.get('shuffleWriteBytes', 0)):>8} "
            f"{mb(s.get('memoryBytesSpilled', 0)):>11} "
            f"{mb(s.get('diskBytesSpilled', 0)):>12} "
            f"{mb(s.get('peakExecutionMemory', 0)):>14}  "
            f"{s.get('name', '')[:60]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
