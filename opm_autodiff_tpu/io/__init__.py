from opm_autodiff_tpu.io.deck import Deck, DeckKeyword, read_deck  # noqa: F401
from opm_autodiff_tpu.io.state import EclState, build_state  # noqa: F401
