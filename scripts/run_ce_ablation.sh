#!/bin/bash
# CE-ablation path: language-derived head + cross-entropy (README --ce_ablation).
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=ImageNet --template=openai_imagenet_template \
  --eval-datasets=ImageNet,ImageNetV2,ImageNetR,ImageNetA,ImageNetSketch,ObjectNet \
  --model='ViT-B/16' --ce_ablation \
  --data-location=datasets/data \
  --batch-size=512 --lr=1e-5 --wd=0.1 --epochs=10 \
  --exp_name=flyp_ce_ablation --save=checkpoints/ "$@"
