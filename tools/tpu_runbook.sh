#!/bin/bash
# TPU validation runbook — run on relay recovery / at round start.
# Round-4 revision: the round-3 device wave settled the big questions
# (pool refine + fused IN stats defaults; lite gate set certified at
# 255-259 im/s with ΔMMA −0.0005; f32-at-batch 45 im/s; split3 = −40
# im/s optional margin — PROOFS.md 2026-08-19). This runbook now
# re-validates the shipped state and captures fresh evidence, ordered
# cheap/decisive first. Logs land in /tmp/runbook/<step>.log.
set -x
mkdir -p /tmp/runbook
cd /root/repo

# 0. Connectivity + device record
timeout 600 python -c "import jax; print(jax.devices())" > /tmp/runbook/00_devices.log 2>&1

# 1. Driver-style default bench sweep (lite/ship x bs16/32) — the
#    BENCH_r{N} artifact; compiles are cached across rounds in .jax_cache
timeout 4500 python bench.py > /tmp/runbook/10_bench_driver_sweep.log 2>&1

# 2. Mosaic device parity (kernel L1 + full-model L2, incl. im2col and
#    the out_ch=2 per-channel-ref tail)
timeout 3000 python tools/kp_parity2.py > /tmp/runbook/20_parity.log 2>&1

# 3. Trained-probe ΔMMA certification. Checkpoints live in /tmp and die
#    with host wipes; retrain ON the TPU (~15 min compile + ~10 min
#    steps each; the 1-core host makes CPU training impractical).
export CONV_ROT=20 CONV_SCALE=0.18 CONV_PHOTO=1.15
CKPT=/tmp/convergence_dlnges9n/ckpts/conv_kp/001
CKPT2=/tmp/conv_head192/ckpts/conv_kp/001
if [ ! -d "$CKPT" ]; then
  CONV_LR1=3e-4 CONV_PAIRS=512 timeout 7000 python -c "
import sys; sys.path[:0] = ['/root/repo', '/root/repo/tools']
from selection_stability import train_probe_ckpt
train_probe_ckpt('/tmp/convergence_dlnges9n', steps1=500, steps2=150)
" > /tmp/runbook/30_ckpt_tpu.log 2>&1
fi
if [ ! -d "$CKPT2" ]; then
  CONV_MODEL=head192 CONV_LR1=3e-4 CONV_PAIRS=512 timeout 7000 python -c "
import sys; sys.path[:0] = ['/root/repo', '/root/repo/tools']
from selection_stability import train_probe_ckpt
train_probe_ckpt('/tmp/conv_head192', steps1=500, steps2=150)
" > /tmp/runbook/31_ckpt192_tpu.log 2>&1
fi
export POSFEAT_PROBE_SEQS=12  # 72-image fixture
LITE="POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 POSFEAT_HEAD_IM2COL=1"
timeout 3600 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/40_probe_base.log 2>&1
env $LITE timeout 3600 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/41_probe_lite.log 2>&1
POSFEAT_PROBE_H=480 POSFEAT_PROBE_W=640 POSFEAT_PROBE_NPTS=8192 \
  env $LITE timeout 4500 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/42_probe_fullsize_lite.log 2>&1
CONV_MODEL=head192 env $LITE timeout 3600 python tools/selection_stability.py --ckpt $CKPT2 \
  > /tmp/runbook/43_probe192_lite.log 2>&1

# 4. Env-gated device tests as dated artifacts (POSFEAT_TPU_TESTS=1 is
#    REQUIRED — conftest forces the CPU mesh otherwise and they skip)
POSFEAT_TPU_TESTS=1 POSFEAT_RUN_STABILITY=1 POSFEAT_STABILITY_CKPT=$CKPT \
  timeout 4000 python -m pytest tests/test_selection_stability.py -x -q -s \
  > /tmp/runbook/50_test_stability.log 2>&1
POSFEAT_TPU_TESTS=1 timeout 4000 python -m pytest tests/test_extractor_throughput.py -x -q -s \
  > /tmp/runbook/51_test_throughput.log 2>&1
POSFEAT_FAST=1 POSFEAT_TPU_TESTS=1 timeout 4000 python -m pytest tests/test_extractor_throughput.py -x -q -s \
  > /tmp/runbook/52_test_throughput_fast.log 2>&1

# 5. Fresh per-op trace of the shipping program (fat map for the round)
env $LITE timeout 3000 python tools/trace_ops.py 16 bf16 pallas \
  > /tmp/runbook/60_trace_lite.log 2>&1

echo DONE > /tmp/runbook/STATUS

# 6. Persist the evidence in-repo (the runbook may fire with no session)
cd /root/repo
{
  echo "# TPU runbook device evidence ($(date -u '+%F %H:%M UTC'))"
  echo
  echo '```'
  python tools/runbook_summary.py /tmp/runbook
  echo '```'
} > RUNBOOK_EVIDENCE.md
git add RUNBOOK_EVIDENCE.md
git commit -m "Record TPU runbook device measurements" || true
