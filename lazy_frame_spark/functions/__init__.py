from lazy_frame_spark.functions.compare import OPS, typed_compare, typed_literal_domain

__all__ = ["typed_compare", "typed_literal_domain", "OPS"]
