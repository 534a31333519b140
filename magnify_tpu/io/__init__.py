"""IO layer (L2): path-pattern reader, TIFF/OME-TIFF, stores, save/load."""
