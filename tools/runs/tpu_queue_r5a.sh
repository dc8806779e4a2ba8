#!/bin/bash
# Round-5 queue A: the METHOD ablation (VERDICT r4 item 1) + mip POL at
# the vanilla schedule (item 2).
#
# Consistency-ON vs OFF at equal budget (8k steps, flagship one-pass
# path, synthetic_pol scene 16 views/128px/4 holdout):
#   arm a: vanilla loss only       (hardmask=F, depth=F, patches=0)
#   arm b: + hardmask RGB          (run_nerf_view.py:1645-1666 semantics)
#   arm c: + masked depth prior    (run_nerf_view.py:1730-1783)
#   arm d: full flagship           (preset: + MiDaS/SSIM patch terms)
# on BOTH splits:
#   int:  interleaved holdout (preset default)
#   tail: tail-of-orbit holdout (synthetic_interleave_test=False) — the
#         sparse extrapolation regime round 1 measured ~10 dB down.
# plus a harsher 8-view/4-tail sparse scene for arms a and d.
#
# ONE TPU process at a time.
cd /root/repo
mkdir -p tools/runs/logs_r5
L=tools/runs/logs_r5

for i in $(seq 1 40); do
  # Cold claims can exceed 2 min; a killed probe can wedge the grant,
  # so give each attempt a generous window and back off between tries.
  if timeout 360 python -c "import jax; print(jax.numpy.zeros(8).sum())" \
      > /dev/null 2>&1; then
    echo "probe ok (attempt $i) $(date)"; break
  fi
  echo "probe failed (attempt $i), sleeping 120s $(date)"; sleep 120
done

BASE="--scene synthetic_pol --set i_print=500 --set checkpoint_every=4000 \
 --set use_tensorboard=false"
A="--set hardmask=False --set with_depth_loss=False --set n_patches=0"
B="--set with_depth_loss=False --set n_patches=0"
C="--set n_patches=0"
D=""
TAIL="--set synthetic_interleave_test=False"
SPARSE="--set synthetic_views=8 --set synthetic_n_test=4 \
 --set synthetic_interleave_test=False"

run_arm () {  # $1=name $2=arm-flags $3=split-flags
  local name=$1; shift
  echo "=== $name $(date)"
  rm -rf /tmp/r5_$name
  timeout 2700 python -m consistentnerf_tpu.cli.train $BASE \
    --set basedir=/tmp/r5_$name --set expname=$name $@ \
    --num-steps 8000 > $L/$name.log 2>&1
  timeout 1200 python -m consistentnerf_tpu.cli.eval $BASE \
    --set basedir=/tmp/r5_$name --set expname=$name $@ \
    --set eval_disable_lpips=true >> $L/$name.log 2>&1
  echo "=== $name done $(date)"
}

run_arm abl_a_int  $A
run_arm abl_d_int  $D
run_arm abl_a_tail $A $TAIL
run_arm abl_d_tail $D $TAIL
run_arm abl_b_tail $B $TAIL
run_arm abl_c_tail $C $TAIL
run_arm abl_b_int  $B
run_arm abl_c_int  $C
run_arm abl_a_sparse $A $SPARSE
run_arm abl_d_sparse $D $SPARSE

# Mip POL at the vanilla POL's 8k schedule, preset recipe pinned
# (VERDICT item 2). anneal steps stay at the reference grid's 256.
MIP="--scene synthetic_pol_mip --set basedir=/tmp/r5_mip --set expname=mip \
 --set total_iters=8000 --set anneal_nearfar_steps=256 \
 --set i_print=250 --set checkpoint_every=4000 --set use_tensorboard=false"
echo "=== mip POL 8k $(date)"
rm -rf /tmp/r5_mip
timeout 3500 python -m consistentnerf_tpu.cli.train $MIP \
  --num-steps 8000 > $L/pol_mip_8k.log 2>&1
timeout 1200 python -m consistentnerf_tpu.cli.eval $MIP \
  --set eval_disable_lpips=true >> $L/pol_mip_8k.log 2>&1
echo "=== mip POL done $(date)"
echo "=== queue A done $(date)"
