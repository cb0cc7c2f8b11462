"""Entity-resolution cascade (ANN blocking + string sim + Leiden)."""
