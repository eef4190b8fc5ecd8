"""Minimal transformWithStateInPandas repro on PySpark 4.1.2, outside pytest.

Observed in this container (2026-08-13; re-verified rounds 4, 5, 6, 7, 8,
9, 10 and 11 — last probe 2026-08-17 round 11 session 4: `import google`
still raises ModuleNotFoundError and this script still prints TWS_CRASH,
so the TWS state-server protocol cannot start):
the streaming query terminates with
  SparkException: TransformWithStateInPySpark driver worker exited
  unexpectedly (crashed)
  Caused by: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE ... ImportError:
  cannot import name 'descriptor' from 'google.protobuf'
because the `protobuf` Python package is not installed here (`import google`
itself fails) and package installs are out of scope. TWS's state-server
protocol is protobuf-based; applyInPandasWithState has no such dependency
and is the T7 implementation used by the registered queries. Re-run this
script after `pip install protobuf` on a real cluster — expect TWS_OK with
non-empty ROWS.
"""
import sys, traceback
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StructType, StructField, LongType, StringType

spark = (SparkSession.builder.master("local[4]").appName("tws-repro")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.streaming.stateStore.providerClass",
                 "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

OUT = StructType([StructField("id", LongType()), StructField("mx", LongType())])

class RunningMax(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle):
        self.mx = handle.getValueState("mx", StructType([StructField("v", LongType())]))
    def handleInputRows(self, key, rows, timerValues):
        cur = self.mx.get()[0] if self.mx.exists() else -1
        for pdf in rows:
            cur = max(cur, int(pdf["value"].max()))
        self.mx.update((cur,))
        yield pd.DataFrame({"id": [key[0]], "mx": [cur]})
    def close(self):
        pass

src = (spark.readStream.format("rate").option("rowsPerSecond", "20").load()
       .selectExpr("value % 3 AS id", "value"))
q = (src.groupBy("id").transformWithStateInPandas(
        RunningMax(), outputStructType=OUT, outputMode="Update", timeMode="None")
     .writeStream.format("memory").queryName("tws_out").outputMode("update")
     .trigger(processingTime="1 second").start())
try:
    import time; time.sleep(12)
    rows = spark.sql("SELECT * FROM tws_out").collect()
    print("ROWS:", sorted((r.id, r.mx) for r in rows)[:10], "n=", len(rows))
    # The failure mode here is a STREAMING-THREAD crash: the main thread
    # sees no exception and the memory sink just stays empty, so ask the
    # query itself (a bare empty-ROWS + TWS_OK would be a false pass).
    exc = q.exception()
    q.stop()
    if exc is not None:
        print("STREAM EXCEPTION:", str(exc)[:500])
        print("TWS_CRASH")
    elif not rows:
        print("TWS_CRASH (no exception surfaced but the sink stayed empty)")
    else:
        print("TWS_OK")
except Exception:
    traceback.print_exc()
    print("TWS_CRASH")
finally:
    spark.stop()
