"""Mixed multi-source datamodules (reference ``data/mixed/``)."""
