#!/bin/bash
# ViT-L/14 (open_clip LAION weights via dash spelling) ImageNet run
# (myshells/run_base_vitL.sh).
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=ImageNet --template=openai_imagenet_template \
  --eval-datasets=ImageNet,ImageNetV2,ImageNetR,ImageNetA,ImageNetSketch,ObjectNet \
  --model='ViT-L-14' --ft_data=datasets/csv/imagenet.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.1 --epochs=10 --warmup_length=500 --remat \
  --exp_name=flyp_imagenet_vitL --save=checkpoints/ "$@"
