"""Deterministic per-language word corpora for caption synthesis.

Six languages matching spec.LANGS. Latin-script lists carry each
language's stopwords (spec.STOPWORDS) so the stopword-density rule and
the hashed-n-gram langid model both have signal. zh/ar use fixed
character inventories (BMP code points only, so Spark's length() and
Python's len() agree).

No external data: every list is hand-written here.
"""

from __future__ import annotations

import numpy as np

from .. import spec

WORDS: dict[str, tuple[str, ...]] = {
    "en": spec.STOPWORDS["en"] + (
        "image", "photo", "picture", "shows", "sunset", "mountain", "river",
        "city", "street", "people", "child", "dog", "cat", "tree", "sky",
        "clouds", "beach", "bridge", "market", "train", "window", "light",
        "color", "small", "large", "old", "young", "walking", "standing",
        "holding", "building", "garden", "flower", "water", "boat", "group",
        "table", "chair", "food", "plate", "smiling", "red", "blue", "green",
    ),
    "es": spec.STOPWORDS["es"] + spec.STOPWORDS["_shared"] + (
        "imagen", "foto", "muestra", "atardecer", "montaña", "río", "ciudad",
        "calle", "gente", "niño", "perro", "gato", "árbol", "cielo", "nubes",
        "playa", "puente", "mercado", "tren", "ventana", "luz", "pequeño",
        "grande", "viejo", "caminando", "edificio", "jardín", "flor", "agua",
        "barco", "grupo", "mesa", "silla", "comida", "rojo", "azul", "verde",
    ),
    "de": spec.STOPWORDS["de"] + (
        "bild", "foto", "zeigt", "sonnenuntergang", "berg", "fluss", "stadt",
        "straße", "menschen", "kind", "hund", "katze", "baum", "himmel",
        "wolken", "strand", "brücke", "markt", "zug", "fenster", "licht",
        "klein", "groß", "alt", "jung", "gebäude", "garten", "blume",
        "wasser", "boot", "gruppe", "tisch", "stuhl", "essen", "rot", "blau",
    ),
    "fr": spec.STOPWORDS["fr"] + spec.STOPWORDS["_shared"] + (
        "photo", "montre", "coucher", "soleil", "montagne", "rivière",
        "ville", "rue", "gens", "enfant", "chien", "chat", "arbre", "ciel",
        "nuages", "plage", "pont", "marché", "train", "fenêtre", "lumière",
        "petit", "grand", "vieux", "jeune", "bâtiment", "jardin", "fleur",
        "eau", "bateau", "groupe", "chaise", "nourriture", "rouge", "bleu",
    ),
    "zh": tuple("这是一张照片显示日落山河城市街道人们孩子狗猫树天空云海滩桥市场火车窗户光颜色小大老年轻走站建筑花园水船群桌椅食物红蓝绿的和在有"),
    "ar": (
        "صورة", "تظهر", "غروب", "جبل", "نهر", "مدينة", "شارع", "ناس",
        "طفل", "كلب", "قطة", "شجرة", "سماء", "غيوم", "شاطئ", "جسر",
        "سوق", "قطار", "نافذة", "ضوء", "صغير", "كبير", "قديم", "حديقة",
        "زهرة", "ماء", "قارب", "مجموعة", "طاولة", "كرسي", "طعام", "في",
        "من", "على", "هذا", "و",
    ),
}

# language mix per FIXTURES.md section 1 (en-heavy -> skew cluster)
LANG_MIX: tuple[tuple[str, float], ...] = (
    ("en", 0.55), ("es", 0.15), ("de", 0.10), ("fr", 0.08),
    ("zh", 0.06), ("ar", 0.03), ("junk", 0.03),
)

PII_SNIPPETS: tuple[str, ...] = (
    "contact john.doe@example.com for details",
    "call +1 (555) 123-4567 now",
    "visit https://example.com/photos?id=42 today",
    "ssn 123-45-6789 leaked",
    "email admin@test.org or www.pics.example.net",
)

JUNK_CHARS = "#$%&*+=@!?~^|<>{}[]()"


def sample_caption(rng: np.random.Generator, lang: str) -> str:
    """One caption: 5-40 words of the language's corpus."""
    if lang == "junk":
        kind = rng.integers(0, 3)
        if kind == 0:                      # repeated char run
            ch = chr(ord("a") + int(rng.integers(0, 26)))
            return ch * int(rng.integers(30, 120))
        if kind == 1:                      # symbol soup
            idx = rng.integers(0, len(JUNK_CHARS), size=int(rng.integers(20, 80)))
            return "".join(JUNK_CHARS[i] for i in idx)
        w = WORDS["en"][int(rng.integers(0, 4))]   # repeated word run
        return " ".join([w] * int(rng.integers(15, 60)))
    words = WORDS[lang]
    n = int(rng.integers(5, 41))
    idx = rng.integers(0, len(words), size=n)
    sep = "" if lang == "zh" else " "
    return sep.join(words[i] for i in idx)
