from monolith_spark.plans.chunks import decode_chunk_dir, encode_chunk_dir

__all__ = ["decode_chunk_dir", "encode_chunk_dir"]
