import sys; sys.path.insert(0, "/root/repo")
import os, sys, time, json, logging
import ray
n = int(sys.argv[1])
ray.init(address="local", num_cpus=n, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.CRITICAL)
from ner_ray.pipelines.kg import KGConfig, read_transcripts, explode_mentions
from ner_ray.stages.tagger import tag_transcripts
from ner_ray.stages.triples import extract_triples
from ner_ray.stages.linker import link_mentions
from ner_ray.stages.canonicalize import canonicalize, rewrite_triples
from ner_ray.stages.dedup import dedup_triples
from ner_ray.fixtures.aliases import make_alias_table
path = "/tmp/ner_ray_cache/bench_tx_n216000"
read_transcripts(path).count()
tag_transcripts(read_transcripts(path).limit(5000), tagger="bert", output="turn_mentions").materialize()
cfg = KGConfig(tagger="bert")
alias_table = make_alias_table(); alias_ref = ray.put(alias_table)
T = {}
t0=time.perf_counter()
tm = tag_transcripts(read_transcripts(path), tagger="bert", output="turn_mentions", batch_size=cfg.tagger_batch_size).materialize()
T["tagger"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter()
raw = extract_triples(tm, window=3, chunk_turns=256).materialize()
T["extract_triples"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter()
mentions = tm.drop_columns(["text"]).map_batches(explode_mentions, batch_format="pyarrow")
linked = link_mentions(mentions, alias_ref=alias_ref, tau=0.6).materialize()
T["explode_link"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter()
mapping, entities = canonicalize(linked, alias_table, max_rounds=8)
mapping = mapping.materialize()
T["canonicalize"]=round(time.perf_counter()-t0,2)
t0=time.perf_counter()
ded = dedup_triples(rewrite_triples(raw, mapping, how="broadcast"))
s = ded.map_batches(lambda t: {"s": [__import__("pyarrow").compute.sum(t["n_support"]).as_py() or 0]}, batch_format="pyarrow").sum("s")
T["rewrite_dedup"]=round(time.perf_counter()-t0,2)
T["total"]=round(sum(v for k,v in T.items() if k!="total"),2)
T["support"]=int(s); T["cpus"]=n
print(json.dumps(T))
ray.shutdown()
