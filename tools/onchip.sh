#!/bin/bash
# On-chip validation queue for when the TPU tunnel is reachable.
# Run from /root/repo:  bash tools/onchip.sh [logfile]
# Order: cheap sanity -> headline bench -> device CLI round trip ->
# production-geometry warmup (validates encode/decode on chip) ->
# HRC-width warmup last (Mosaic compiles can take ~35 min uncached).
set -u
LOG=${1:-/tmp/onchip_$(date +%H%M).log}
cd /root/repo
run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a "$LOG"
  return $rc
}

run 360 sanity python -c "import jax,numpy as np,jax.numpy as jnp; x=jnp.ones((256,256))@jnp.ones((256,256)); print(float(np.asarray(x)[0,0]))" || { echo "TPU unreachable; aborting" | tee -a "$LOG"; exit 1; }

run 580 bench python bench.py

# device CLI round trip (micro + random fixtures, exception tracks)
python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
from tests import fixtures
import os
os.makedirs("/tmp/vfy", exist_ok=True)
fixtures.random_vcf("/tmp/vfy/rand.vcf", n_samples=127, n_records=300, seed=7)
fixtures.micro_missing("/tmp/vfy/m.vcf")
PYEOF
run 400 dev-compress env XSI_DEVICE=jax python -m xsqueezeit_tpu.cli -c -f /tmp/vfy/rand.vcf -o /tmp/vfy/dev.xsi
run 400 dev-extract env XSI_DEVICE=jax python -m xsqueezeit_tpu.cli -x -f /tmp/vfy/dev.xsi -o /tmp/vfy/dev.out.vcf
run 60 dev-compare python - <<'PYEOF'
def gts(p):
    return [l.rstrip("\n").split("\t")[9:] for l in open(p)
            if not l.startswith("#")]
a, b = gts("/tmp/vfy/rand.vcf"), gts("/tmp/vfy/dev.out.vcf")
assert a == b, "device round trip mismatch"
print("device round trip identical:", len(a), "records")
PYEOF
run 400 dev-missing env XSI_DEVICE=jax python -m xsqueezeit_tpu.cli -c -f /tmp/vfy/m.vcf -o /tmp/vfy/m.xsi
run 400 dev-missing-x env XSI_DEVICE=jax python -m xsqueezeit_tpu.cli -x -f /tmp/vfy/m.xsi -o /tmp/vfy/m.out.vcf

# production geometry: encode+decode every WAH bucket on chip (asserts)
run 3000 warmup-1kgp3 python -m xsqueezeit_tpu.bench warmup --samples 2504

# HRC width LAST: uncached Mosaic compiles can take ~35 min per shape
run 9000 warmup-hrc python -m xsqueezeit_tpu.bench warmup --samples 32488 --block-length 4096

echo "=== queue done ($(date +%H:%M:%S)); see $LOG ===" | tee -a "$LOG"
