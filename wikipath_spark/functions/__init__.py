from wikipath_spark.functions.extract import extract_refs_udf, sha256_col

__all__ = ["extract_refs_udf", "sha256_col"]
