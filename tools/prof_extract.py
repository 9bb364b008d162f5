import sys; sys.path.insert(0, "/root/repo")
import time, json, logging
import ray
n = int(sys.argv[1])
ray.init(address="local", num_cpus=n, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.CRITICAL)
from ner_ray.pipelines.kg import read_transcripts
from ner_ray.stages.tagger import tag_transcripts
from ner_ray.stages.triples import extract_pattern_triples, add_salted_chunks, add_group_key, make_window_extractor
from ner_ray.utils import pool_size
path = "/tmp/ner_ray_cache/bench_tx_n216000"
read_transcripts(path).count()
tm = tag_transcripts(read_transcripts(path), tagger="bert", output="turn_mentions").materialize()
T = {}
t0=time.perf_counter(); tm.map_batches(extract_pattern_triples, batch_format="pyarrow").count(); T["pattern"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter()
narrow = tm.drop_columns(["text"])
chunked = add_salted_chunks(narrow, chunk_turns=256, window=3)
keyed = chunked.map_batches(add_group_key, batch_format="pyarrow").materialize()
T["salt_key"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter(); kr = keyed.repartition(pool_size()[1]).materialize(); T["coalesce"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter(); kr.groupby("bucket").map_groups(make_window_extractor(3), batch_format="pyarrow").count(); T["group_window"]=round(time.perf_counter()-t0,2)
print(json.dumps({"cpus": n, **T}))
ray.shutdown()
