"""native subpackage."""
