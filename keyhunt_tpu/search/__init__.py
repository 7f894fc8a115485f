"""Search modes: batched range walkers (xpoint/rmd160/address/eth modes)
and BSGS. The device does O(keys) work; hosts do O(hits) + O(setup)."""
