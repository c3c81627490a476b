"""Graph IO: cv::FileStorage-compatible JSON loading/saving and synthetic
dataset generators (the reference ships only binary fixtures, ba_input.7z)."""
