"""Random run-name generation (reference ``modeling.py:160-161`` uses the
``randomname`` package for Lightning version strings like ``solid-lab``;
that package needs an install, so a compact local adjective-noun generator
stands in — same shape, no dependency)."""
import random

_ADJECTIVES = (
    "amber", "bold", "brisk", "calm", "civic", "coral", "crisp", "deep",
    "dusky", "eager", "fleet", "fond", "glad", "grand", "hardy", "ideal",
    "jolly", "keen", "limber", "lively", "lucid", "mellow", "nimble",
    "noble", "opal", "pale", "quick", "rapid", "robust", "sage", "sleek",
    "solid", "spry", "stark", "steady", "swift", "tidy", "trusty", "vivid",
    "wise",
)

_NOUNS = (
    "anchor", "basin", "beacon", "bridge", "canyon", "cedar", "comet",
    "crane", "delta", "ember", "fjord", "garnet", "glade", "harbor",
    "heron", "inlet", "jetty", "kestrel", "lagoon", "lantern", "meadow",
    "mesa", "oriole", "osprey", "pylon", "quarry", "ridge", "sable",
    "sparrow", "spire", "summit", "tarn", "thicket", "tundra", "vale",
    "vertex", "willow", "wren", "zenith", "zephyr",
)


def random_run_name(rng: random.Random = None) -> str:
    """An ``adjective-noun`` run name, e.g. ``swift-lagoon``."""
    rng = rng or random.SystemRandom()
    return f"{rng.choice(_ADJECTIVES)}-{rng.choice(_NOUNS)}"
