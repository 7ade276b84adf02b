"""fastfilter_spark — PySpark-native xor/binary-fuse filters and mergeable sketches."""
__version__ = "0.1.0"
