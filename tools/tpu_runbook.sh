#!/bin/bash
# TPU validation runbook — run when the relay recovers.
# Each step logs to /tmp/runbook/<step>.log. Steps are ordered so that
# cheap/decisive measurements come first and every program compile is
# cached for later steps.
set -x
mkdir -p /tmp/runbook
cd /root/repo
CKPT=/tmp/convergence_dlnges9n/ckpts/conv_kp/001
if [ ! -d "$CKPT" ]; then
  # checkpoint lost (host/tmp cleaned): retrain it on CPU first (~25 min)
  POSFEAT_PLATFORM=cpu CONV_LR1=3e-4 CONV_PAIRS=512 CONV_ROT=20 CONV_SCALE=0.18 CONV_PHOTO=1.15 \
    timeout 7000 python -c "
import sys; sys.path[:0] = ['/root/repo', '/root/repo/tools']
from selection_stability import train_probe_ckpt
train_probe_ckpt('/tmp/convergence_dlnges9n', steps1=500, steps2=150)
" > /tmp/runbook/00_retrain_ckpt.log 2>&1
fi
# probe fixtures must match the nuisance regime the checkpoints were
# trained with (the calibrated medium recipe)
export CONV_ROT=20 CONV_SCALE=0.18 CONV_PHOTO=1.15
export POSFEAT_PROBE_SEQS=12  # 72-image fixture: ~1.7x tighter delta-MMA

# 0. Connectivity + device record
timeout 600 python -c "import jax; print(jax.devices())" > /tmp/runbook/00_devices.log 2>&1

# 1. Matched-dtype device parity of the im2col head variant (kernel + model)
timeout 3000 python tools/kp_parity2.py > /tmp/runbook/01_parity_im2col.log 2>&1

# 1b. Decisive bench pair first (2 compiles): baseline and all-gates —
#     establishes the speed upside before the longer probe wave
POSFEAT_BENCH_CONFIGS=16:bf16 timeout 3000 python bench.py > /tmp/runbook/10_bench_base.log 2>&1
POSFEAT_BENCH_CONFIGS=16:bf16 POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 timeout 3000 python bench.py > /tmp/runbook/14_bench_all.log 2>&1

# 2. Trained-probe baseline: f32-XLA vs bf16-Pallas MMA@3px (VERDICT #4)
timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/02_probe_base.log 2>&1

# 3. Trained-probe per variant (each changes only the bf16 program)
POSFEAT_HEAD_IM2COL=1 timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/03_probe_im2col.log 2>&1
POSFEAT_SAMPLE_IMPL=pair timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/04_probe_pair.log 2>&1
POSFEAT_TOPK=approx timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/05_probe_approx.log 2>&1
POSFEAT_HEAD_RING=0 timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/06_probe_noring.log 2>&1
# descriptor-tail f32 OPERANDS (round-3 candidate bf16 ΔMMA fix:
# residual error is operand rounding where descriptors form)
POSFEAT_DESC_TAIL_F32=iconv2 timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/07_probe_tail_iconv2.log 2>&1
POSFEAT_DESC_TAIL_F32=up2 timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/08_probe_tail_up2.log 2>&1
# cheap decompositions of the up2 fix (CPU: up2 is inside budget at
# -0.0048/-0.0041; these isolate WHERE the upconv2 precision matters)
POSFEAT_DESC_TAIL_F32=up2o timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/08b_probe_tail_up2o.log 2>&1
POSFEAT_DESC_TAIL_F32=upsamp timeout 3000 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/08c_probe_tail_upsamp.log 2>&1
# full-size fixture at the HPatches operating point (480x640, 8192 pts):
# tail-of-ranking churn at 16x the small-fixture budget (VERDICT r2 weak #2)
POSFEAT_PROBE_H=480 POSFEAT_PROBE_W=640 POSFEAT_PROBE_NPTS=8192 \
  timeout 4500 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/09_probe_fullsize_base.log 2>&1
POSFEAT_PROBE_H=480 POSFEAT_PROBE_W=640 POSFEAT_PROBE_NPTS=8192 POSFEAT_DESC_TAIL_F32=up2 \
  timeout 4500 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/09b_probe_fullsize_up2.log 2>&1
# the shipping candidate at the operating point (non-interpret Pallas)
POSFEAT_PROBE_H=480 POSFEAT_PROBE_W=640 POSFEAT_PROBE_NPTS=8192 POSFEAT_DESC_TAIL_F32=split3 \
  timeout 4500 python tools/selection_stability.py --ckpt $CKPT \
  > /tmp/runbook/09c_probe_fullsize_split3.log 2>&1

# 4. Bench A/Bs at bs16 only (one compile each)
export POSFEAT_BENCH_CONFIGS=16:bf16
POSFEAT_HEAD_IM2COL=1 timeout 3000 python bench.py > /tmp/runbook/11_bench_im2col.log 2>&1
POSFEAT_SAMPLE_IMPL=pair timeout 3000 python bench.py > /tmp/runbook/12_bench_pair.log 2>&1
POSFEAT_TOPK=approx timeout 3000 python bench.py > /tmp/runbook/13_bench_approx.log 2>&1
POSFEAT_HEAD_RING=0 timeout 3000 python bench.py > /tmp/runbook/13b_bench_noring.log 2>&1
POSFEAT_REFINE=pool timeout 3000 python bench.py > /tmp/runbook/13c_bench_refinepool.log 2>&1
POSFEAT_SAMPLE_F32=0 timeout 3000 python bench.py > /tmp/runbook/13d_bench_samplebf16.log 2>&1
POSFEAT_DESC_TAIL_F32=iconv2 timeout 3000 python bench.py > /tmp/runbook/13e_bench_tail_iconv2.log 2>&1
POSFEAT_DESC_TAIL_F32=up2 timeout 3000 python bench.py > /tmp/runbook/13f_bench_tail_up2.log 2>&1
POSFEAT_DESC_TAIL_F32=up2o timeout 3000 python bench.py > /tmp/runbook/13g_bench_tail_up2o.log 2>&1
POSFEAT_DESC_TAIL_F32=upsamp timeout 3000 python bench.py > /tmp/runbook/13h_bench_tail_upsamp.log 2>&1
# split-conv tail variants: same operand de-rounding as up2 at 2x/3x
# bf16 MXU cost instead of Precision.HIGHEST f32's 6x (PROOFS.md)
POSFEAT_DESC_TAIL_F32=split2 timeout 3000 python bench.py > /tmp/runbook/13i_bench_tail_split2.log 2>&1
POSFEAT_DESC_TAIL_F32=split3 timeout 3000 python bench.py > /tmp/runbook/13j_bench_tail_split3.log 2>&1
# score-f32 cost attribution (default ON; measures the f32 score-map
# bandwidth cost — expected ~0.05 ms/img class)
POSFEAT_SCORE_F32=0 timeout 3000 python bench.py > /tmp/runbook/13k_bench_scoref32_off.log 2>&1
# the two leading ship candidates WITH all speed gates on:
POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 POSFEAT_DESC_TAIL_F32=split2 \
  timeout 3000 python bench.py > /tmp/runbook/14b_bench_all_split2.log 2>&1
POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 POSFEAT_DESC_TAIL_F32=split3 \
  timeout 3000 python bench.py > /tmp/runbook/14c_bench_all_split3.log 2>&1
POSFEAT_BENCH_CONFIGS=16:f32 timeout 3000 python bench.py > /tmp/runbook/16_bench_f32_bs16.log 2>&1

# 5. bs32 with the winning combo (judged later; compile is the cost)
POSFEAT_BENCH_CONFIGS=32:bf16 POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 \
  timeout 3000 python bench.py > /tmp/runbook/15_bench_bs32_all.log 2>&1

# 6. Tile-size sweep for kernel1 under im2col (one big matmul per tile
#    now — the 8x32 default was tuned for the 9-matmul dataflow)
for T in "8,64" "16,32" "8,16"; do
  POSFEAT_BENCH_CONFIGS=16:bf16 POSFEAT_HEAD_IM2COL=1 POSFEAT_HEAD_T1="$T" \
    timeout 3000 python bench.py > /tmp/runbook/20_bench_im2col_t${T/,/x}.log 2>&1
done

# 6b. Fresh per-op trace with all gates on — what fat remains?
POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 \
  timeout 3000 python tools/trace_ops.py 16 bf16 pallas \
  > /tmp/runbook/25_trace_all_gates.log 2>&1

# 7. VERDICT done-criteria artifacts: product-path throughput test +
#    selection-stability pytest (uses the surviving trained ckpt)
timeout 4000 python -m pytest tests/test_extractor_throughput.py -x -q -s \
  > /tmp/runbook/30_test_throughput.log 2>&1
POSFEAT_RUN_STABILITY=1 POSFEAT_STABILITY_CKPT=$CKPT \
  timeout 4000 python -m pytest tests/test_selection_stability.py -x -q -s \
  > /tmp/runbook/31_test_stability.log 2>&1

# 8. Flagship-head-shaped trained probe (192-ch head; ckpt trained on
#    CPU this session with CONV_MODEL=head192) — the delta-MMA probe
#    then exercises the exact flagship head programs the bench runs
CKPT2=/tmp/conv_head192/ckpts/conv_kp/001
if [ -d "$CKPT2" ]; then
  CONV_MODEL=head192 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/40_probe192_base.log 2>&1
  CONV_MODEL=head192 POSFEAT_HEAD_IM2COL=1 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/41_probe192_im2col.log 2>&1
  CONV_MODEL=head192 POSFEAT_HEAD_RING=0 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/42_probe192_noring.log 2>&1
  CONV_MODEL=head192 POSFEAT_HEAD_IM2COL=1 POSFEAT_SAMPLE_IMPL=pair POSFEAT_TOPK=approx POSFEAT_HEAD_RING=0 \
    timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/43_probe192_all.log 2>&1
  CONV_MODEL=head192 POSFEAT_DESC_TAIL_F32=iconv2 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/44_probe192_tail_iconv2.log 2>&1
  CONV_MODEL=head192 POSFEAT_DESC_TAIL_F32=up2 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/45_probe192_tail_up2.log 2>&1
  CONV_MODEL=head192 POSFEAT_DESC_TAIL_F32=split2 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/46_probe192_tail_split2.log 2>&1
  CONV_MODEL=head192 POSFEAT_DESC_TAIL_F32=split3 timeout 3000 python tools/selection_stability.py --ckpt $CKPT2 \
    > /tmp/runbook/47_probe192_tail_split3.log 2>&1
fi

echo DONE > /tmp/runbook/STATUS

# 9. Persist the device evidence into the repo immediately — the
#    runbook may fire from the recovery watcher with no live session,
#    and /tmp does not survive the round.
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
