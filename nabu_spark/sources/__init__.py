"""Input adapters: driver-testdata tables -> pipeline input shapes."""
