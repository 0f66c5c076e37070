import numpy as np
from PIL import Image

from premvos_tpu.data.crops import VocCropDataset

VOC_XML = """<annotation>
  <filename>{name}</filename>
  <object><name>thing</name>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
  <object><name>tiny</name>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax><ymax>5</ymax></bndbox>
  </object>
</annotation>"""


def test_voc_crop_dataset(tmp_path, rng):
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    for i in range(3):
        name = f"{i:06d}.jpg"
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "JPEGImages" / name, quality=95)
        (tmp_path / "Annotations" / f"{i:06d}.xml").write_text(
            VOC_XML.format(name=name, x1=10, y1=10, x2=40 + i, y2=45)
        )
    ds = VocCropDataset(tmp_path, crop_size=32)
    assert len(ds) == 3  # tiny boxes filtered by min_area
    crop = ds.load_crop(0, rng)
    assert crop.shape == (32, 32, 3)
    crops, ids = ds.pk_batch(rng, p=2, k=2)
    assert crops.shape == (4, 32, 32, 3)
