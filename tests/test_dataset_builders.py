import json

import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import flickr8k, mscoco
from multimodalworddiscovery_tpu.frontend.speech import MfccConfig, extract
import jax.numpy as jnp


@pytest.fixture()
def flickr_files(tmp_path):
    (tmp_path / "Flickr8k.token.txt").write_text(
        "1.jpg#0\tA dog chases the ball .\n"
        "1.jpg#1\tThe dog runs fast\n"
        "2.jpg#0\tA cat sits on grass\n"
        "3.jpg#0\tunknownimage caption\n"
    )
    (tmp_path / "lexicon.txt").write_text(
        "a AH\ndog D AO G\nchases CH EY S IH Z\nthe DH AH\nball B AO L\n"
        "runs R AH N Z\nfast F AE S T\ncat K AE T\nsits S IH T S\n"
        "on AA N\ngrass G R AE S\n"
    )
    (tmp_path / "concepts.txt").write_text(
        "1.jpg dog ball\n2.jpg cat grass\n"
    )
    return tmp_path


def test_flickr8k_builder(flickr_files):
    d = flickr_files
    corpus, gold, meta = flickr8k.build_corpus(
        d / "Flickr8k.token.txt", d / "lexicon.txt", d / "concepts.txt"
    )
    assert corpus.n == 3  # 3.jpg has no concepts -> dropped
    assert meta["utterance_ids"] == ["1.jpg#0", "1.jpg#1", "2.jpg#0"]
    # utt 0: "a dog chases the ball" -> dog (pos 1), ball (pos 2)
    sl = np.asarray(corpus.src_len)
    a0 = gold.alignment[0, : sl[0]]
    # a(1) dog(3) chases(5) the(2) ball(3) = 14 phones
    assert sl[0] == 14
    assert (a0[1:4] == 1).all()  # dog -> concept position 1
    assert (a0[-3:] == 2).all()  # ball -> concept position 2
    assert a0[0] == 0 and (a0[4:9] == 0).all()
    # gold segments spell words
    segs0 = gold.segments[0]
    assert len(segs0) == 2
    cv = meta["concept_vocab"]
    assert segs0[0][2] == cv["dog"] and segs0[1][2] == cv["ball"]


def test_flickr8k_roundtrip_through_io(flickr_files, tmp_path):
    from multimodalworddiscovery_tpu.data.io import load_corpus, save_corpus

    d = flickr_files
    corpus, gold, _ = flickr8k.build_corpus(
        d / "Flickr8k.token.txt", d / "lexicon.txt", d / "concepts.txt"
    )
    out = tmp_path / "out"
    save_corpus(corpus, gold, out, "flickr8k")
    loaded, gold2 = load_corpus(out, "flickr8k")
    np.testing.assert_array_equal(np.asarray(loaded.src), np.asarray(corpus.src))
    np.testing.assert_array_equal(gold2.alignment, gold.alignment)


@pytest.fixture()
def coco_files(tmp_path):
    instances = {
        "categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "frisbee"}],
        "annotations": [
            {"image_id": 10, "category_id": 1},
            {"image_id": 10, "category_id": 2},
            {"image_id": 10, "category_id": 1},
            {"image_id": 20, "category_id": 2},
        ],
        "images": [{"id": 10}, {"id": 20}],
    }
    captions = {
        "annotations": [
            {"image_id": 10, "caption": "a dog catches a frisbee"},
            {"image_id": 20, "caption": "a frisbee on grass"},
        ]
    }
    (tmp_path / "instances.json").write_text(json.dumps(instances))
    (tmp_path / "captions.json").write_text(json.dumps(captions))
    (tmp_path / "lexicon.txt").write_text(
        "a AH\ndog D AO G\ncatches K AE CH IH Z\nfrisbee F R IH Z B IY\n"
        "on AA N\ngrass G R AE S\n"
    )
    return tmp_path


def test_mscoco_builder(coco_files):
    d = coco_files
    corpus, gold, meta = mscoco.build_corpus(
        d / "instances.json", d / "captions.json", d / "lexicon.txt"
    )
    assert corpus.n == 2
    # image 10 concepts deduped: [dog, frisbee]
    tl = np.asarray(corpus.trg_len)
    assert tl[0] == 2
    a0 = gold.alignment[0, : np.asarray(corpus.src_len)[0]]
    assert (a0 > 0).sum() == 3 + 6  # dog (D AO G) + frisbee (F R IH Z B IY)


def test_speechcoco_builder(coco_files):
    d = coco_files
    (d / "manifest.tsv").write_text(
        "w1.wav\t10\ta dog catches a frisbee\nw2.wav\t20\ta frisbee on grass\n"
    )
    rng = np.random.default_rng(0)

    def fake_loader(path):
        return rng.normal(size=4000).astype(np.float32) * 0.1

    def mfcc_fn(wav, lens):
        return extract(jnp.asarray(wav), jnp.asarray(lens), MfccConfig())

    corpus, meta = mscoco.build_speech_corpus(
        d / "manifest.tsv", d / "instances.json", fake_loader, mfcc_fn
    )
    assert corpus.n == 2
    assert corpus.src.ndim == 3 and corpus.src.shape[-1] == 13
    assert np.asarray(corpus.src_len)[0] == (4000 - 400) // 160 + 1


def test_flickr30k_entities_parser(tmp_path):
    from multimodalworddiscovery_tpu.data import flickr30k_entities as f30k

    tokens, spans = f30k.parse_sentence(
        "[/EN#40331/people A young woman] looks at [/EN#40332/other a book] quietly ."
    )
    assert tokens == ["a", "young", "woman", "looks", "at", "a", "book", "quietly"]
    assert spans == [(0, 3, "40331", "people"), (5, 7, "40332", "other")]

    # non-visual EN#0 is dropped from spans
    t2, s2 = f30k.parse_sentence("[/EN#0/notvisible Nothing] here")
    assert t2 == ["nothing", "here"] and s2 == []


def test_flickr30k_entities_corpus(tmp_path):
    from multimodalworddiscovery_tpu.data import flickr30k_entities as f30k

    d = tmp_path / "Sentences"
    d.mkdir()
    (d / "100.txt").write_text(
        "[/EN#1/people A man] rides [/EN#2/vehicles a red bike]\n"
        "[/EN#1/people The man] sits\n"
    )
    (d / "200.txt").write_text("[/EN#3/animals A dog] chases [/EN#4/other a ball]\n")
    (tmp_path / "lex.txt").write_text(
        "a AH\nman M AE N\nrides R AY D Z\nred R EH D\nbike B AY K\n"
        "the DH AH\nsits S IH T S\ndog D AO G\nchases CH EY S\nball B AO L\n"
    )
    corpus, gold, meta = f30k.build_corpus(d, tmp_path / "lex.txt")
    assert corpus.n == 3
    # utt 0: "a man" -> people (positions 1..4 phones), "a red bike" -> vehicles
    import numpy as np

    sl = np.asarray(corpus.src_len)
    a0 = gold.alignment[0, : sl[0]]
    cv = meta["concept_vocab"]
    assert "people" in cv and "vehicles" in cv
    # first 4 phones (a man) aligned to people's trg position
    assert a0[0] == a0[3] and a0[0] > 0
    # multiword mention merged into ONE gold segment
    segs0 = gold.segments[0]
    assert len(segs0) == 2
    # "a red bike" = AH + R EH D + B AY K = 7 phones
    assert segs0[1][1] - segs0[1][0] == 7


def test_flickr30k_boxes(tmp_path):
    from multimodalworddiscovery_tpu.data import flickr30k_entities as f30k

    (tmp_path / "100.xml").write_text(
        "<annotation><size><width>200</width><height>100</height></size>"
        "<object><name>1</name><bndbox><xmin>20</xmin><ymin>10</ymin>"
        "<xmax>120</xmax><ymax>60</ymax></bndbox></object>"
        "<object><name>1</name><name>2</name><bndbox><xmin>0</xmin><ymin>0</ymin>"
        "<xmax>200</xmax><ymax>100</ymax></bndbox></object></annotation>"
    )
    boxes = f30k.parse_boxes(tmp_path / "100.xml")
    assert len(boxes["1"]) == 2 and len(boxes["2"]) == 1
    np.testing.assert_allclose(boxes["1"][0], [0.1, 0.1, 0.6, 0.6])
