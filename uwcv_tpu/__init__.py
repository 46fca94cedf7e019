"""uwcv_tpu — TPU-native instance-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Deam0on/uw-com-vision research pipeline (Detectron2 Mask R-CNN training,
batch inference with mask post-processing + RLE export, and morphological
measurement of predicted instances), designed TPU-first:

- fixed static shapes everywhere (padded boxes/proposals/detections) so the
  whole hot path compiles to one XLA program on the MXU;
- Flax ResNet-50/101-FPN Mask R-CNN with folded FrozenBN, bf16 compute;
- fixed-shape NMS / RoIAlign / mask-paste / mask-morphology as XLA programs
  with Pallas TPU kernels for the hot ops;
- jit/pjit data parallelism over a ``jax.sharding.Mesh`` (ICI collectives);
- orbax checkpointing, torch ``.pth`` weight import, COCO mAP evaluation,
  and a trial-parallel HPO engine.

Reference behavior being rebuilt: /root/reference/nn_train.py,
nn_inference.py (see SURVEY.md for the full component inventory).
"""

__version__ = "0.1.0"
