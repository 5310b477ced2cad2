"""CLI entry points mirroring the reference's three-script public surface:
``train_fine`` / ``extract_fineFEAT`` / ``train_coarse_fineFEAT``
(BASELINE.json "public surface")."""
