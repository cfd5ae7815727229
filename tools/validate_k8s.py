#!/usr/bin/env python3
"""Offline structural validation of deploy/k8s-ingest.yaml.

kubectl --dry-run=client needs API discovery, which this container
can't reach (zero egress), so this checks what the schema would:
well-formed YAML docs, known apiVersion/kind pairs, required spec
fields, selector/template label agreement, volume/volumeMount
agreement, and the spark-submit arg contract (class, jar, trigger).
"""
import sys
import yaml

docs = list(yaml.safe_load_all(open("deploy/k8s-ingest.yaml")))
assert len(docs) == 2, f"expected 2 docs, got {len(docs)}"
dep, pvc = docs

assert (dep["apiVersion"], dep["kind"]) == ("apps/v1", "Deployment")
assert (pvc["apiVersion"], pvc["kind"]) == ("v1", "PersistentVolumeClaim")

spec = dep["spec"]
sel = spec["selector"]["matchLabels"]
tpl = spec["template"]
assert sel.items() <= tpl["metadata"]["labels"].items(), "selector must match template labels"
assert spec["replicas"] == 1 and spec["strategy"]["type"] == "Recreate", \
    "one driver per checkpoint requires replicas=1 + Recreate"

[c] = tpl["spec"]["containers"]
mounts = {m["name"] for m in c["volumeMounts"]}
vols = {v["name"] for v in tpl["spec"]["volumes"]}
assert mounts <= vols, f"unbound volumeMounts: {mounts - vols}"
pvc_refs = {v["persistentVolumeClaim"]["claimName"]
            for v in tpl["spec"]["volumes"] if "persistentVolumeClaim" in v}
assert pvc["metadata"]["name"] in pvc_refs, "PVC is not referenced"

args = c["args"]
assert args[0].endswith("spark-submit")
assert "graft.streaming.IngestStreamMain" in args, "entry class missing"
jar = [a for a in args if a.endswith(".jar")]
assert jar, "application jar missing"
tail = args[args.index(jar[0]) + 1:]
assert len(tail) == 4 and tail[3] == "60", \
    f"app args must be (bucket, warehouse, checkpoint, 60): {tail}"
for mode in ("requests", "limits"):
    assert "memory" in c["resources"][mode]
print("deploy/k8s-ingest.yaml: structurally valid (2 docs, labels, volumes, submit contract)")
