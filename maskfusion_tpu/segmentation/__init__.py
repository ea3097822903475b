"""Instance segmentation subsystem (ref: Core/Segmentation).

`create_segmenter` is the strategy dispatcher equivalent of
Segmentation::init (Segmentation.cpp:47-66): 'maskfusion' fuses semantic
masks with geometric edges, 'precomputed' maps mask files directly to
models, 'cofusion' is the CRF-based variant."""

from maskfusion_tpu.segmentation.result import ModelData, SegmentationResult


def create_segmenter(method: str, config, resolution, intrinsics):
    if method in ("maskfusion", "mask_fusion"):
        from maskfusion_tpu.segmentation.mf_segmentation import MfSegmentation
        return MfSegmentation(config, resolution, intrinsics)
    if method == "precomputed":
        from maskfusion_tpu.segmentation.pre_segmentation import PreSegmentation
        return PreSegmentation(config)
    if method in ("cofusion", "co_fusion"):
        from maskfusion_tpu.segmentation.cf_segmentation import CfSegmentation
        return CfSegmentation(config, resolution, intrinsics)
    raise ValueError(f"unknown segmentation method: {method}")


__all__ = ["SegmentationResult", "ModelData", "create_segmenter"]
