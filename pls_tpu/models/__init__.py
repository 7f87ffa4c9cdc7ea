"""PLS model families: Dayal–MacGregor kernel algorithms 1/2 (the
reference's methods), plus classical NIPALS and SIMPLS variants."""
