"""Host-side video I/O: decoders (native libav / OpenCV), prefetchers, encoders."""
