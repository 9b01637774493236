from diffpure_tpu.data.datasets import (
    cifar10_subset,
    imagenet_val_subset,
    celebahq_subset,
    load_data,
    imval_transform,
)

__all__ = ["cifar10_subset", "imagenet_val_subset", "celebahq_subset",
           "load_data", "imval_transform"]
