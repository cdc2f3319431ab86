from albedo_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    extract_embeddings,
    sample_frames,
)

__all__ = ["MEDIA_SCHEMA", "decode_images", "extract_embeddings", "sample_frames"]
