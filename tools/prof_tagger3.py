import sys; sys.path.insert(0, "/root/repo")
import time, json, logging
import ray
n = int(sys.argv[1]); bs = int(sys.argv[2])
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
tm = tag_transcripts(read_transcripts(path), tagger="bert", output="turn_mentions", batch_size=bs).materialize()
dt = time.perf_counter() - t0
import re
st = tm.stats()
m = re.search(r"MapBatches\(BertTagger\).*?Remote wall time: (.*?) min, (.*?) max", st, re.S)
print(json.dumps({"cpus": n, "bs": bs, "secs": round(dt,2), "task_minmax": m.groups() if m else None}))
ray.shutdown()
