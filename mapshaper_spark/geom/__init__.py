from mapshaper_spark.geom import kernels, cells  # noqa: F401
