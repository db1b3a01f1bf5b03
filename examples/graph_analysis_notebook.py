"""Port of the reference `GraphAnalysis.ipynb` notebook
(`/root/reference/examples/notebooks/GraphAnalysis.ipynb`) against
synthetic data: graph analysis of an atomic lattice — segment a graphene
image, extract coordinates, build the bond graph from covalent radii, and
locate non-6-member-ring defects.

The notebook's arc:
1. load a graphene STEM image + a pretrained segmentation model,
2. predict -> {frame: N x 3 [x, y, class]} coordinates,
3. ``graphx.find_cycle_clusters(coord, cycles=5/7/[5,7,8], map_dict,
   px2ang)`` -> clusters of atoms belonging to defect rings,
4. overlay the clusters on the image.

Here the lattice is a synthetic honeycomb (carbon) with a single vacancy:
the pristine region is pure 6-rings, and the ring analysis flags the
larger merged ring around the missing atom.

Run:  python examples/graph_analysis_notebook.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import atomai_tpu as aoi  # noqa: E402
from atomai_tpu.utils import graphx  # noqa: E402

CC_BOND_ANG = 1.42  # graphene C-C bond length in angstroms


def honeycomb(nx_cells=6, ny_cells=6):
    """Honeycomb lattice coordinates (angstrom), 2 atoms per cell."""
    a1 = np.array([3 / 2, np.sqrt(3) / 2]) * CC_BOND_ANG
    a2 = np.array([3 / 2, -np.sqrt(3) / 2]) * CC_BOND_ANG
    basis = [np.zeros(2), np.array([CC_BOND_ANG, 0.0])]
    pts = [i * a1 + j * a2 + b
           for i in range(nx_cells) for j in range(-ny_cells, ny_cells)
           for b in basis]
    return np.asarray(pts)


def main():
    # -- 1-2. coordinates. The notebook gets them from a pretrained
    # Segmentor; the segmentation->Locator path is exercised by the other
    # examples, so here the lattice is synthesized directly and one atom
    # is removed to create a vacancy defect.
    px2ang = 0.104                      # notebook's pixel-size constant
    xy_ang = honeycomb(7, 5)
    center = xy_ang.mean(0)
    vacancy = np.argmin(np.linalg.norm(xy_ang - center, axis=1))
    print("atoms: %d, removing atom %d to create a vacancy"
          % (len(xy_ang), vacancy))
    xy_ang = np.delete(xy_ang, vacancy, axis=0)
    # back to pixel units + class column, the Locator output format
    coord = np.concatenate(
        [xy_ang / px2ang, np.zeros((len(xy_ang), 1))], axis=1)
    map_dict = {0: "C"}

    # -- 3. ring statistics --------------------------------------------
    rings6 = graphx.find_cycles(coord, 6, map_dict, px2ang)
    print("6-ring atoms found:", len(rings6))

    # the vacancy merges three hexagons into one 12-member ring
    clusters = graphx.find_cycle_clusters(coord, 12, map_dict, px2ang)
    print("defect clusters:", len(clusters))
    assert len(clusters) >= 1
    defect_center = clusters[0][:, :2].mean(0) * px2ang
    err = np.linalg.norm(defect_center - center)
    print("defect ring centered %.2f A from the vacancy" % err)

    # -- 4. overlay (file output instead of notebook display) ----------
    if os.environ.get("GRAPH_PLOT"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 8))
        ax.scatter(coord[:, 1], coord[:, 0], s=12, color="gray")
        for i, cl in enumerate(clusters):
            ax.scatter(cl[:, 1], cl[:, 0], s=16, color="red")
            ax.annotate(str(i + 1), (cl[:, 1].mean(), cl[:, 0].mean()),
                        size=10)
        fig.savefig("/tmp/graph_defects.png", dpi=120)
        print("overlay saved to /tmp/graph_defects.png")

    # -- bonus: export the defect-free structure for ab initio tools
    # (aseutils, reference `atomai/utils/aseutils.py`)
    from atomai_tpu.utils.aseutils import ase_obj_basic
    frame = {0: np.concatenate([coord[:, :2],
                                np.zeros((len(coord), 1)),
                                coord[:, 2:]], axis=1)}
    ase_obj_basic(frame, 0, "graphene", map_dict,
                  filepath="/tmp/graphene_vacancy", px2ang=px2ang)
    print("POSCAR written:", os.path.exists("/tmp/graphene_vacancy"))


if __name__ == "__main__":
    main()
