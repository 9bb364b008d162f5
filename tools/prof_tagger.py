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
path = "/tmp/ner_ray_cache/bench_tx_n216000"
read_transcripts(path).count()
tag_transcripts(read_transcripts(path).limit(5000), tagger="bert", output="turn_mentions").materialize()
t0 = time.perf_counter()
tm = tag_transcripts(read_transcripts(path), tagger="bert", output="turn_mentions").materialize()
dt = time.perf_counter() - t0
print(json.dumps({"cpus": n, "tagger_secs": round(dt, 2)}))
print(tm.stats()[:4000])
ray.shutdown()
