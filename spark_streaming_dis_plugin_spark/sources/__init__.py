"""DIS-shaped log sources: offset model, rate control, on-disk log, DataSource."""
