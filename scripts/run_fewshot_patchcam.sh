#!/bin/bash
# Few-shot PatchCamelyon (README.md:86): k in {4,16,32}, bs256, 20 epochs,
# warmup 0, lr 1e-6, wd 0.0; 50 restarts with mean/std reporting.
set -e
K=${K:-16}
python -m flyp_tpu.cli.few_shot \
  --train-dataset=PatchCamelyonVal --template=patchcamelyon_template \
  --eval-datasets=PatchCamelyonVal,PatchCamelyonTest --k=$K \
  --model='ViT-B/16' --ft_data=datasets/csv/patchcamelyon/train.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-6 --wd=0.0 --epochs=20 --warmup_length=0 \
  --exp_name=flyp_patchcam_k$K --save=checkpoints/ "$@"
