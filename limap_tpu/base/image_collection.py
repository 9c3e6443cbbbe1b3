"""ImageCollection — the central scene container.

Host-side map-of-cameras + map-of-images mirroring the reference
(/root/reference/src/limap/base/image_collection.h:24-115), with a
`.batch()` view that extracts the SoA arrays kernels consume.  Dict
serialization is layout-compatible with our Camera/CameraPose dicts so
scenes round-trip through ``np.save``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from limap_tpu.base.camera import (Camera, CameraPose, CameraView,
                                   CameraViewsBatch)


class CameraImage:
    """cam_id + pose + image name (camera_view.h:19-54)."""

    def __init__(self, cam_id: int, pose: Optional[CameraPose] = None,
                 image_name: str = "none"):
        self.cam_id = int(cam_id)
        self.pose = pose if pose is not None else CameraPose(initialized=False)
        self.image_name = image_name

    def R(self):
        return self.pose.R()

    def T(self):
        return self.pose.T()

    def as_dict(self) -> dict:
        return {"cam_id": self.cam_id, "pose": self.pose.as_dict(),
                "image_name": self.image_name}

    @classmethod
    def from_dict(cls, d: dict) -> "CameraImage":
        return cls(d["cam_id"], CameraPose.from_dict(d["pose"]),
                   d.get("image_name", "none"))


class ImageCollection:
    def __init__(self, cameras=None, images=None):
        """cameras: {cam_id: Camera} | [Camera]; images: {img_id:
        CameraImage} | [CameraImage]."""
        self.cameras: Dict[int, Camera] = {}
        self.images: Dict[int, CameraImage] = {}
        if cameras is not None:
            if isinstance(cameras, dict):
                self.cameras = {int(k): v for k, v in cameras.items()}
            else:
                for cam in cameras:
                    cid = cam.camera_id if cam.camera_id >= 0 else len(
                        self.cameras)
                    self.cameras[cid] = cam
        if images is not None:
            if isinstance(images, dict):
                self.images = {int(k): v for k, v in images.items()}
            else:
                self.images = {i: im for i, im in enumerate(images)}

    @classmethod
    def from_views(cls, camviews: List[CameraView]) -> "ImageCollection":
        cams, imgs = {}, {}
        for i, v in enumerate(camviews):
            cid = v.cam.camera_id if v.cam.camera_id >= 0 else i
            cams[cid] = v.cam
            imgs[i] = CameraImage(cid, v.pose, v.image_name)
        return cls(cams, imgs)

    # ---- counting / listing ----
    def NumCameras(self) -> int:
        return len(self.cameras)

    def NumImages(self) -> int:
        return len(self.images)

    def get_cam_ids(self) -> List[int]:
        return sorted(self.cameras.keys())

    def get_img_ids(self) -> List[int]:
        return sorted(self.images.keys())

    def get_cameras(self) -> List[Camera]:
        return [self.cameras[i] for i in self.get_cam_ids()]

    def get_images(self) -> List[CameraImage]:
        return [self.images[i] for i in self.get_img_ids()]

    def get_camviews(self) -> List[CameraView]:
        return [self.camview(i) for i in self.get_img_ids()]

    def get_map_camviews(self) -> Dict[int, CameraView]:
        return {i: self.camview(i) for i in self.get_img_ids()}

    def get_locations(self) -> List[np.ndarray]:
        return [self.campose(i).center() for i in self.get_img_ids()]

    def get_map_locations(self) -> Dict[int, np.ndarray]:
        return {i: self.campose(i).center() for i in self.get_img_ids()}

    def get_image_name_list(self) -> List[str]:
        return [self.images[i].image_name for i in self.get_img_ids()]

    def get_image_name_dict(self) -> Dict[int, str]:
        return {i: self.images[i].image_name for i in self.get_img_ids()}

    # ---- element access ----
    def cam(self, cam_id: int) -> Camera:
        return self.cameras[cam_id]

    def exist_cam(self, cam_id: int) -> bool:
        return cam_id in self.cameras

    def camimage(self, img_id: int) -> CameraImage:
        return self.images[img_id]

    def exist_image(self, img_id: int) -> bool:
        return img_id in self.images

    def campose(self, img_id: int) -> CameraPose:
        return self.images[img_id].pose

    def camview(self, img_id: int) -> CameraView:
        im = self.images[img_id]
        return CameraView(self.cameras[im.cam_id], im.pose, im.image_name)

    def image_name(self, img_id: int) -> str:
        return self.images[img_id].image_name

    def read_image(self, img_id: int, set_gray: bool = False):
        return self.camview(img_id).read_image(set_gray)

    # ---- mutation ----
    def set_max_image_dim(self, val: int) -> None:
        for cam in self.cameras.values():
            cam.set_max_image_dim(val)

    def set_camera_params(self, cam_id: int, params) -> None:
        cam = self.cameras[cam_id]
        cam.params = np.asarray(params, dtype=np.float64)

    def change_camera(self, cam_id: int, cam: Camera) -> None:
        self.cameras[cam_id] = cam

    def set_camera_pose(self, img_id: int, pose: CameraPose) -> None:
        self.images[img_id].pose = pose

    def get_camera_pose(self, img_id: int) -> CameraPose:
        return self.images[img_id].pose

    def change_image(self, img_id: int, camimage: CameraImage) -> None:
        self.images[img_id] = camimage

    def change_image_name(self, img_id: int, new_name: str) -> None:
        self.images[img_id].image_name = new_name

    # ---- subsetting (image_collection.h:40-53) ----
    def subset_by_camera_ids(self, valid_camera_ids) -> "ImageCollection":
        valid = set(valid_camera_ids)
        cams = {k: v for k, v in self.cameras.items() if k in valid}
        imgs = {k: v for k, v in self.images.items() if v.cam_id in valid}
        return ImageCollection(cams, imgs)

    def subset_by_image_ids(self, valid_image_ids) -> "ImageCollection":
        valid = set(valid_image_ids)
        imgs = {k: v for k, v in self.images.items() if k in valid}
        used_cams = {im.cam_id for im in imgs.values()}
        cams = {k: v for k, v in self.cameras.items() if k in used_cams}
        return ImageCollection(cams, imgs)

    def subset_initialized(self) -> "ImageCollection":
        ids = [i for i in self.get_img_ids() if self.images[i].pose.initialized]
        return self.subset_by_image_ids(ids)

    def update_neighbors(self, neighbors: Dict[int, List[int]]):
        """Drop neighbor entries that are not in the collection
        (image_collection.h:54-55)."""
        out = {}
        for img_id, ngs in neighbors.items():
            if not self.exist_image(img_id):
                continue
            out[img_id] = [n for n in ngs if self.exist_image(n)]
        return out

    def apply_similarity_transform(self, scale, R, t) -> "ImageCollection":
        """Sim3: world' = scale * R @ world + t (image_collection.h:96-97)."""
        out = ImageCollection(dict(self.cameras), {})
        R = np.asarray(R)
        t = np.asarray(t)
        for img_id, im in self.images.items():
            R_cam = im.pose.R()
            new_R = R_cam @ R.T
            new_t = scale * im.pose.tvec - new_R @ t
            out.images[img_id] = CameraImage(
                im.cam_id, CameraPose(R=new_R, tvec=new_t), im.image_name)
        return out

    def get_first_image_id_by_camera_id(self, cam_id: int) -> int:
        for img_id in self.get_img_ids():
            if self.images[img_id].cam_id == cam_id:
                return img_id
        return -1

    def init_uninitialized_cameras(self) -> None:
        for cam in self.cameras.values():
            if cam.w() <= 0 or cam.h() <= 0:
                continue
            if np.all(cam.params == 0):
                f = 1.2 * max(cam.w(), cam.h())
                cam.params[list(cam.focal_idxs())] = f
                pi = cam.pp_idxs()
                cam.params[pi[0]] = cam.w() / 2.0
                cam.params[pi[1]] = cam.h() / 2.0

    def uninitialize_poses(self) -> None:
        for im in self.images.values():
            im.pose = CameraPose(initialized=False)

    def uninitialize_intrinsics(self) -> None:
        for cam in self.cameras.values():
            cam.params[:] = 0.0

    # ---- checks ----
    def IsUndistorted(self) -> bool:
        return all(cam.is_undistorted() for cam in self.cameras.values())

    def IsUndistortedCameraModel(self) -> bool:
        return all(cam.model_id in (0, 1) for cam in self.cameras.values())

    # ---- serialization ----
    def as_dict(self) -> dict:
        return {
            "cameras": {k: v.as_dict() for k, v in self.cameras.items()},
            "images": {k: v.as_dict() for k, v in self.images.items()},
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ImageCollection":
        cams = {int(k): Camera.from_dict(v) for k, v in d["cameras"].items()}
        imgs = {int(k): CameraImage.from_dict(v)
                for k, v in d["images"].items()}
        return cls(cams, imgs)

    # ---- device extraction ----
    def batch(self) -> CameraViewsBatch:
        """SoA batch ordered by sorted image id."""
        return CameraViewsBatch.from_views(self.get_camviews())

    def img_id_to_index(self) -> Dict[int, int]:
        """Map img_id -> dense row index in :meth:`batch` order."""
        return {img_id: i for i, img_id in enumerate(self.get_img_ids())}
