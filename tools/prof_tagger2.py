import sys; sys.path.insert(0, "/root/repo")
import time, json, logging
import ray
n = int(sys.argv[1])
conc = sys.argv[2]  # "auto" or "NxM" or int
ray.init(address="local", num_cpus=n, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.CRITICAL)
from ner_ray.pipelines.kg import read_transcripts
from ner_ray.stages.tagger import tag_transcripts
path = "/tmp/ner_ray_cache/bench_tx_n216000"
read_transcripts(path).count()
kw = {}
if conc != "auto":
    kw["concurrency"] = tuple(map(int, conc.split("x"))) if "x" in conc else int(conc)
tag_transcripts(read_transcripts(path).limit(5000), tagger="bert", output="turn_mentions", **kw).materialize()
t0 = time.perf_counter()
tm = tag_transcripts(read_transcripts(path), tagger="bert", output="turn_mentions", **kw).materialize()
dt = time.perf_counter() - t0
print(json.dumps({"cpus": n, "conc": conc, "tagger_secs": round(dt, 2)}))
ray.shutdown()
