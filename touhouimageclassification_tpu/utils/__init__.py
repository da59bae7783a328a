"""Host-side utilities: logging, class maps, dataset statistics, checkpoint
conversion, dataset tools."""
