"""datacube_core_spark — PySpark-native rebuild of the ODC analytics engine."""

__version__ = "0.1.0"
