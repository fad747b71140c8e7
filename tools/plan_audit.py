import sys, os, re
sys.path.insert(0, '/root/repo')
from lazy_frame_spark.parity import REGISTRY
from lazy_frame_spark.session import get_spark
from bench import BENCH_QUERIES
spark = get_spark("audit"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"
rows = [r for r in BENCH_QUERIES]
print(f"{'row':34s} {'Exch':>4} {'Bcast':>5} {'BatchPy':>7} {'ArrowPy':>7} {'PandasGrp':>9} {'SMJ':>3} {'Cart':>4}")
for name in rows:
    try:
        df = REGISTRY[name].fn(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as e:
        print(f"{name:34s} ERR {type(e).__name__}: {str(e)[:60]}")
        continue
    n = lambda p: len(re.findall(p, txt))
    print(f"{name:34s} {n('(?<!Broadcast)Exchange'):>4} {n('BroadcastExchange'):>5} {n('BatchEvalPython'):>7} {n('ArrowEvalPython'):>7} {n('FlatMapGroupsInPandas|MapInPandas|MapInArrow'):>9} {n('SortMergeJoin'):>3} {n('CartesianProduct|BroadcastNestedLoop'):>4}")
