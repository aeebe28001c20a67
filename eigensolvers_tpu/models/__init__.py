"""Problem families: DVR bases, MCTDH .op operators, synthetic spectra."""
